from ragraph_tpu.rag.library import (  # noqa: F401
    LibraryConfig, ToyGraphLibrary, library_init, library_reset,
    library_append, build_entries_batch, build_library, retrieve,
)
from ragraph_tpu.rag.augmentation import (  # noqa: F401
    augment_features, augment_adj, interpolation_node, augment_graph,
)

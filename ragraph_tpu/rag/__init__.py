from ragraph_tpu.rag.library import (  # noqa: F401
    LibraryConfig, ToyGraphLibrary, library_init, library_reset,
    library_append, build_entries_batch, build_library, retrieve,
)
from ragraph_tpu.rag.augmentation import (  # noqa: F401
    augment_features, augment_adj, interpolation_node, augment_graph,
)
from ragraph_tpu.rag.pretrain_aug import (  # noqa: F401
    aug_random_mask, aug_random_edge, aug_drop_node, aug_subgraph,
    make_graphcl_views,
)
from ragraph_tpu.rag.fewshot import (  # noqa: F401
    FewShotBase, fewshot_mean_logits, fewshot_predict_logits,
    fewshot_predict_labels, fewshot_predict_loss,
)
from ragraph_tpu.rag.ivf import IVFIndex, build_ivf, ivf_search, kmeans  # noqa: F401

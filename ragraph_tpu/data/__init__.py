from ragraph_tpu.data.tu import TUDataset, TUGraph, load_tu_dataset  # noqa: F401
from ragraph_tpu.data.synthetic import (  # noqa: F401
    synthetic_tu_dataset, synthetic_edge_stream, planted_partition_graph,
)
from ragraph_tpu.data.batching import (  # noqa: F401
    flat_batches, stacked_batches, compute_pad_nodes,
)

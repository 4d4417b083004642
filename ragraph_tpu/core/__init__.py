from ragraph_tpu.core.graph import (  # noqa: F401
    DenseGraph,
    EdgeGraph,
    dense_batch_from_graphs,
    normalize_adj_dense,
    row_normalize_adj,
    round_up,
    segment_mean,
)

from ragraph_tpu.data.tu import TUDataset, TUGraph, load_tu_dataset  # noqa: F401
from ragraph_tpu.data.synthetic import (  # noqa: F401
    synthetic_tu_dataset, synthetic_edge_stream, planted_partition_graph,
)
from ragraph_tpu.data.batching import (  # noqa: F401
    flat_batches, stacked_batches, compute_pad_nodes,
)
from ragraph_tpu.data.edgelist import (  # noqa: F401
    EdgeDataset, load_edge_dataset, merge_rows, parse_edge_file,
    timestamp_to_time_step,
)
from ragraph_tpu.data.planetoid import (  # noqa: F401
    load_planetoid, row_normalize_features, standardize_data, adj_to_bias,
    micro_f1, sample_mask,
)
from ragraph_tpu.data.fewshot_export import (  # noqa: F401
    sample_k_shot_nodes, sample_k_shot_graphs, export_fewshot_splits, load_fewshot_split,
)

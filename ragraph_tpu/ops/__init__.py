from ragraph_tpu.ops.propagation import aggregate_k_hop_dense, aggregate_k_hop_edges  # noqa: F401
from ragraph_tpu.ops.similarity import cosine_similarity, l2_normalize  # noqa: F401
from ragraph_tpu.ops.pagerank import pagerank_dense, pagerank_edges, degree_centrality_dense, inverse_sample_prob_dense, inverse_sample_prob_edges  # noqa: F401
from ragraph_tpu.ops.shortest_path import all_pairs_shortest_paths, anchor_distances, position_aware_codes  # noqa: F401
from ragraph_tpu.ops.segment import segment_softmax, scatter_sum  # noqa: F401
from ragraph_tpu.ops.topk import cosine_topk, topk_gather  # noqa: F401
from ragraph_tpu.ops.pallas_retrieval import fused_cosine_topk  # noqa: F401
from ragraph_tpu.ops.bucket_topk import bucketed_exact_topk, column_topk, row_topk  # noqa: F401
from ragraph_tpu.ops.pallas_segment import (  # noqa: F401
    gather_scale_segsum, sorted_segment_sum, sorted_segment_sum_grad,
    sorted_segment_sum_packed, sorted_segment_sum_packed_w,
    streaming_cumsum)

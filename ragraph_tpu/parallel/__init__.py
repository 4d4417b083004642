from ragraph_tpu.parallel.mesh import (  # noqa: F401
    dp_spec, make_mesh, make_multislice_mesh, replicate, shard_rows,
)
from ragraph_tpu.parallel.sharded_index import (  # noqa: F401
    sharded_cosine_topk, sharded_gather_rows, sharded_retrieve,
)
from ragraph_tpu.parallel.dp import make_dp_train_step, shard_batch  # noqa: F401
from ragraph_tpu.parallel.sharded_library import (  # noqa: F401
    build_sharded_library, sharded_library_append, sharded_library_init,
)
from ragraph_tpu.parallel.edge_sharded import (  # noqa: F401
    ShardedEdges, shard_edges_by_receiver, sharded_lightgcn_propagate,
    sharded_propagate_per_step)
from ragraph_tpu.parallel.sharded_selection import (  # noqa: F401
    kth_largest_psum, sharded_huge_k_fuse, sharded_kth_largest)

from ragraph_tpu.utils.native import (  # noqa: F401
    native_available, parse_edge_file_native, negative_sample_native,
    build_csr_native,
)
from ragraph_tpu.utils.seed import seed_everything  # noqa: F401
from ragraph_tpu.utils.compile_cache import enable_compilation_cache  # noqa: F401

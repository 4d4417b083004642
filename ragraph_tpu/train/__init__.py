from ragraph_tpu.train.metrics import RankingEvaluator  # noqa: F401
from ragraph_tpu.train.trainer import EdgeTrainer, TrainResult  # noqa: F401
from ragraph_tpu.train.checkpoint import (  # noqa: F401
    save_checkpoint, restore_checkpoint, restore_sharded,
    BestCheckpointKeeper,
)
from ragraph_tpu.train.logging import RunLogger, log_exceptions  # noqa: F401
from ragraph_tpu.train.profiling import (  # noqa: F401
    phase, phase_totals, annotate, start_trace, stop_trace,
    tree_all_finite, assert_all_finite,
)
from ragraph_tpu.train.prefetch import prefetch, PrefetchIterator  # noqa: F401
from ragraph_tpu.train.torch_import import (  # noqa: F401
    load_torch_state_dict, tables_from_torch,
)

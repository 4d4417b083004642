from ragraph_tpu.train.metrics import RankingEvaluator  # noqa: F401
from ragraph_tpu.train.trainer import EdgeTrainer, TrainResult  # noqa: F401

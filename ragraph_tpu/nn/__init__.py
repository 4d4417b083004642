from ragraph_tpu.nn.layers import (  # noqa: F401
    DenseGCN, DenseGAT, PReLU, BilinearDiscriminator, BilinearDiscriminator2,
    avg_readout,
)
from ragraph_tpu.nn.stack import GCNStack, MaskedBatchNorm  # noqa: F401
from ragraph_tpu.nn.heads import (  # noqa: F401
    TaskDecoder, LogReg, LpHead, DGIHead, GraphCLHead, compare_loss,
)
from ragraph_tpu.nn.lora import LoRAFactors, svd_init, apply_lora  # noqa: F401
from ragraph_tpu.nn.gating import learned_gate, random_gate  # noqa: F401
from ragraph_tpu.nn.prompts import (  # noqa: F401
    DownPrompt, DownstreamPrompt, WeightedPrompt, WeightedFeature,
    average_emb, sum_pool_by_graph, distance_to_center, onehot,
)

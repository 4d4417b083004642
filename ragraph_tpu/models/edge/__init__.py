from ragraph_tpu.models.edge.base import (  # noqa: F401
    EdgeModelConfig, bpr_loss, nce_loss, cal_infonce, reg_loss_emb,
    edge_drop_mask, hash_edge_mask, relative_time_encoding,
    lightgcn_propagate,
)
from ragraph_tpu.models.edge.ragraph_edge import (  # noqa: F401
    TemporalLightGCN, LightGCNEdge, GraphPro, RAGraphEdge,
    EdgeGraphArrays, edge_config_for, EDGE_DATASET_CONFIGS,
)
from ragraph_tpu.models.edge.staged import (  # noqa: F401
    staged_finetune, staged_dynamic, interpolative_merge, StageResult,
)
from ragraph_tpu.models.edge.plugins import (  # noqa: F401
    PluginBase, SGLPlugin, SimGCLPlugin, MixGCFPlugin, LightGCNPlugin,
)
from ragraph_tpu.models.edge.dynamic import (  # noqa: F401
    Roland, EvolveGCNH, EvolveGCNO, gru_cell, gru_cell_init, ema_merge,
    make_dynamic,
)
from ragraph_tpu.models.edge.graphprompt import (  # noqa: F401
    GraphPromptEdge, make_prompted,
)

from ragraph_tpu.models.preprompt import PrePrompt, prompt_pretrain_sample, subgraph3_mean  # noqa: F401
from ragraph_tpu.models.ragraph_node import RAGraphNode, RAGraphNodeConfig, RAGraphNodeState  # noqa: F401
from ragraph_tpu.models.ragraph_graph import (  # noqa: F401
    RAGraphGraph, RAGraphGraphConfig, graph_library_config,
    GRAPH_FUSION_WEIGHTS,
)
from ragraph_tpu.models.ragraph_fewshot import (  # noqa: F401
    RAGraphFewshot, RAGraphFewshotConfig, RAGraphFewshotState,
    FewshotSupportSet, fewshot_library_config,
    FEWSHOT_NODE_WEIGHTS, FEWSHOT_GRAPH_WEIGHTS,
)

from ragraph_tpu.models.preprompt import PrePrompt, prompt_pretrain_sample, subgraph3_mean  # noqa: F401
from ragraph_tpu.models.ragraph_node import RAGraphNode, RAGraphNodeConfig, RAGraphNodeState  # noqa: F401

"""RAGraph-TPU: a TPU-native retrieval-augmented graph learning framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of RAGraph
(NeurIPS 2024, arXiv 2410.23855): toy-graph vector libraries built from
frozen GNN encoders, cosine top-k retrieval, message-passing prompting
fusion, and the full task suite (node / graph / few-shot classification
and dynamic link-prediction recommendation) — engineered for TPU:

- static shapes + padding everywhere (jit-once, no retraces),
- MXU-friendly dense/blocked matmuls for message passing and scoring,
- Pallas kernels for the fused cosine-score + top-k retrieval hot path,
- `jax.sharding.Mesh` + `shard_map` for the ICI-sharded retrieval index
  and data-parallel training (no NCCL/MPI: XLA collectives).

Package layout:
    core/      graph containers, padding, PRNG plumbing
    ops/       numeric kernels (propagation, pagerank, APSP, top-k, segment ops)
    nn/        layers and pretraining heads (GCN, DGI/GraphCL/Lp, decoders, LoRA)
    rag/       the RAG core: library build, retrieval, fusion
    models/    task pipelines (node / graph / fewshot / edge-recsys)
    data/      dataset loaders (TU, Planetoid, edge lists, synthetic)
    parallel/  mesh helpers, sharded retrieval index, dp training
    train/     trainer, metrics, checkpointing, logging
"""

__version__ = "0.1.0"

from ragraph_tpu.core.graph import DenseGraph, EdgeGraph  # noqa: F401

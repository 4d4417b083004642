"""ragraph_tpu quickstart: the three pipelines in ~100 lines.

Runs on any backend (forces CPU here so it works without the TPU):

  python examples/quickstart.py
"""

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import jax.random as jr
import numpy as np
import optax

from ragraph_tpu.data import (flat_batches, load_edge_dataset,
                              stacked_batches, synthetic_edge_stream,
                              synthetic_tu_dataset)
from ragraph_tpu.models import RAGraphNode, RAGraphNodeConfig
from ragraph_tpu.models.edge import EdgeGraphArrays, EdgeModelConfig, RAGraphEdge
from ragraph_tpu.rag import LibraryConfig
from ragraph_tpu.train import EdgeTrainer


def node_classification():
    """Frozen encoder -> toy-graph library -> retrieval-augmented logits."""
    ds = synthetic_tu_dataset(seed=0, num_graphs=40, num_classes=3,
                              feat_dim=16)
    train, test = ds.subset(0, .7), ds.subset(.7, 1)
    pad = 8 * max(g.features.shape[0] for g in ds.graphs)

    cfg = RAGraphNodeConfig(
        emb_size=32, num_class=3,
        library=LibraryConfig(level="node", num_inverse_sample=0,
                              num_augment_scale=0, retrieve_num=4,
                              toy_graph_hop=2, use_positions=False))
    task = RAGraphNode(cfg, feature_dim=16)
    state = task.init_state(jr.key(0), library_capacity=4096)

    # build the retrieval library from the train split (vmapped batch)
    state = task.build_library(state, stacked_batches(train.graphs, 8),
                               jr.key(1))
    print(f"library fill: {int(state.library.fill)} entries")

    # a couple of fine-tuning steps (encoder + decoder train jointly)
    opt = optax.adam(1e-2)
    step = task.make_train_step(opt)
    opt_state = opt.init({"encoder": state.encoder_params,
                          "decoder": state.decoder_params})
    for i, g in enumerate(flat_batches(train.graphs, 8, pad)):
        state, opt_state, loss = step(state, opt_state, g,
                                      jr.fold_in(jr.key(2), i))
    acc = task.accuracy(state, flat_batches(test.graphs, 8, pad))
    print(f"node accuracy: {acc:.3f} (chance 0.333)")


def recommendation():
    """Temporal LightGCN + RAG resource graph + BPR training + serving."""
    train_rows, stages = synthetic_edge_stream(seed=0, num_users=48,
                                               num_items=96, num_stages=1)
    ds = load_edge_dataset(train_rows,
                           [(u, i) for (u, i, _) in stages[0]])
    cfg = EdgeModelConfig(emb_size=16, num_layers=2, batch_size=128,
                          early_stop_patience=3)
    graph = EdgeGraphArrays.from_dataset(ds)

    model = RAGraphEdge(cfg, graph, phase="pretrain")
    params = model.init_params(jr.key(0))
    trainer = EdgeTrainer(model, ds, logger=lambda *_: None)
    result = trainer.train(params, jr.key(1), num_epochs=5,
                           rng=np.random.default_rng(0))
    print(f"recall@20 after pretrain: "
          f"{float(result.best_perform['recall'][0]):.4f}")

    # serving: top-5 recommendations for the first 4 users
    scores, items = model.recommend(result.best_params,
                                    jnp.arange(4, dtype=jnp.int32), k=5)
    print("top-5 items for users 0-3:")
    print(np.asarray(items))


def fast_retrieval():
    """The retrieval kernels directly."""
    from ragraph_tpu.ops.topk import cosine_topk

    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.normal(size=(4096, 64)).astype(np.float32))
    queries = jnp.asarray(rng.normal(size=(32, 64)).astype(np.float32))
    scores, idx = cosine_topk(queries, keys, 10)  # auto: exact here,
    # approx_max_k above 32k rows, method="pallas" for the fused kernel
    print(f"retrieved top-10 of {keys.shape[0]} keys; "
          f"best score {float(scores[0, 0]):.3f}")


if __name__ == "__main__":
    node_classification()
    recommendation()
    fast_retrieval()

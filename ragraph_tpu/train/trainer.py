"""Edge-model trainer: epoch loop, eval-per-epoch, early stop, checkpoints.

Parity target: ``Trainer`` (``RAGraph_edge/utils/trainer.py:10-133``):
shuffled edge batches, Adam, eval every epoch, best-recall early stopping
with patience, save-on-best.

TPU-native: the whole (loss, grads, update) step is one jitted function
reused across epochs; batches are host-sampled (users, pos, neg) int32
arrays of a fixed size, so there is exactly one compilation.
"""

from __future__ import annotations

import dataclasses
from functools import partial
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ragraph_tpu.train.metrics import RankingEvaluator


@dataclasses.dataclass
class TrainResult:
    best_perform: dict
    best_params: Any
    epochs_run: int
    history: list


class EdgeTrainer:
    """Train a :class:`TemporalLightGCN`-family model on an EdgeDataset."""

    def __init__(self, model, dataset, cfg=None, logger: Callable = print,
                 evaluator: RankingEvaluator | None = None, mesh=None):
        self.model = model
        self.dataset = dataset
        self.cfg = cfg or model.cfg
        self.log = logger
        self.mesh = mesh  # multi-chip placement (see _place_*)
        self.evaluator = evaluator or RankingEvaluator(
            metrics=self.cfg.metrics, ks=self.cfg.metrics_k,
            eval_batch_size=self.cfg.eval_batch_size)

    # -- multi-chip placement ------------------------------------------------
    # Embedding tables shard row-wise over the mesh's ``idx`` axis (the
    # memory axis — a 100M-user table never exists on one chip); all other
    # params replicate; batches shard over ``dp`` so XLA inserts the
    # gradient all-reduce. The models' propagation goes through the
    # explicit shard_map path when the graph carries sharded auxiliaries
    # (TemporalLightGCN._propagate_layers).

    def _place_params(self, params):
        if self.mesh is None:
            return params
        from jax.sharding import NamedSharding, PartitionSpec as P
        idx = ("idx" if "idx" in self.mesh.axis_names
               and self.mesh.shape["idx"] > 1 else None)
        rows = NamedSharding(self.mesh, P(idx))
        repl = NamedSharding(self.mesh, P())

        def place(path, x):
            name = path[-1].key if hasattr(path[-1], "key") else ""
            table = name.endswith("_embedding") and getattr(x, "ndim", 0) == 2
            return jax.device_put(x, rows if table else repl)

        return jax.tree_util.tree_map_with_path(place, params)

    def _place_batch(self, *arrays):
        if self.mesh is None:
            return arrays
        from jax.sharding import NamedSharding
        from ragraph_tpu.parallel.mesh import dp_spec
        s = NamedSharding(self.mesh, dp_spec(self.mesh))
        return tuple(jax.device_put(a, s) for a in arrays)

    def _make_step(self, optimizer):
        """One jitted (loss, grad, update) step.

        The graph arrays and the retrieval library enter as *jit arguments*
        (pytrees), not closure captures — the compiled executable carries
        no multi-GB graph constants and serves any same-shape graph (e.g.
        successive temporal stages) without recompiling.

        Deliberately NOT cached across trainer instances: a fresh closure
        per stage costs a ~1s retrace (the XLA compile itself hits the
        persistent compilation cache, so same-shape stages don't
        recompile), but reusing a step traced for an earlier stage would
        silently bake in that stage's per-instance state for the dynamic
        models (ROLAND's ``meta_layers``, EvolveGCN-H's ``last_emb`` are
        instance attributes captured at trace time, not arguments).
        """
        model = self.model

        # donate the optimizer state (Adam m+v = 2x the table memory):
        # the updated state reuses the input buffers instead of a fresh
        # allocation. Params are NOT donated — callers legitimately hold
        # aliases (best-snapshot, re-running a step on two graphs).
        @partial(jax.jit, donate_argnums=(1,))
        def step(params, opt_state, users, pos, neg, key, graph, resources):
            def loss_fn(p):
                loss, aux = model.cal_loss(p, (users, pos, neg), key,
                                           graph=graph, resources=resources)
                return loss, aux

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, aux

        return step

    def _graph_and_resources(self):
        model = self.model
        resources = None
        if getattr(model, "use_rag", False) \
                and model.resource_keys is not None:
            resources = (model.resource_keys, model.resource_values)
        return model.graph, resources

    def train(self, params, key: jax.Array, num_epochs: int | None = None,
              rng: np.random.Generator | None = None,
              checkpoint_dir: str | None = None,
              checkpoint_every: int = 10) -> TrainResult:
        """Train with optional full-state checkpoint/resume.

        If ``checkpoint_dir`` is given, (params, optimizer state, epoch,
        best metrics) are saved every ``checkpoint_every`` epochs and
        training resumes from the latest snapshot on restart — full
        optimizer-state resume, which the reference lacks (it only saves
        model ``state_dict`` on best metric, SURVEY.md §5).
        """
        import os

        from ragraph_tpu.train.checkpoint import (restore_checkpoint,
                                                  save_checkpoint)

        cfg = self.cfg
        rng = rng or np.random.default_rng(0)
        num_epochs = num_epochs if num_epochs is not None else cfg.num_epochs
        if self.mesh is not None:
            dp_total = int(np.prod([self.mesh.shape[a]
                                    for a in self.mesh.axis_names
                                    if a in ("dp", "dcn")])) or 1
            if cfg.batch_size % max(dp_total, 1):
                raise ValueError(f"batch_size {cfg.batch_size} must divide "
                                 f"by the data-parallel extent {dp_total}")
        params = self._place_params(params)
        optimizer = optax.adam(cfg.lr)
        opt_state = optimizer.init(params)
        step = self._make_step(optimizer)
        graph_arg, resources_arg = self._graph_and_resources()

        best = {"recall": np.zeros(len(cfg.metrics_k)),
                "ndcg": np.zeros(len(cfg.metrics_k))}
        best_params = params
        stop_counter = 0
        history = []
        epochs_run = 0
        start_epoch = 0

        resume_path = (os.path.join(checkpoint_dir, "train_state")
                       if checkpoint_dir else None)
        if resume_path and os.path.exists(resume_path + ".pkl"):
            snap = restore_checkpoint(resume_path, use_orbax=False)
            params = self._place_params(
                jax.tree.map(jnp.asarray, snap["params"]))
            # the Adam state mirrors the param tree (mu/nu dicts keyed by
            # the same names), so the same placement rule shards its
            # table moments; left on the default device, GSPMD would
            # re-reshard the moments onto the mesh every step
            opt_state = self._place_params(
                jax.tree.map(jnp.asarray, snap["opt_state"]))
            best = snap["best"]
            best_params = self._place_params(
                jax.tree.map(jnp.asarray, snap["best_params"]))
            start_epoch = snap["epoch"] + 1
            stop_counter = snap["stop_counter"]
            self.log(f"resumed from {resume_path} at epoch {start_epoch}")

        for epoch in range(start_epoch, num_epochs):
            t0 = time.time()
            losses, nb = [], 0
            from ragraph_tpu.train.prefetch import prefetch
            # MixGCF-style models consume (B, n_negs) candidate negatives
            n_negs = cfg.n_negs if getattr(self.model, "multi_negs",
                                           False) else 1
            for users, pos, neg in prefetch(self.dataset.train_batches(
                    cfg.batch_size, rng, n_negs=n_negs,
                    drop_remainder=True), depth=2):
                k = jax.random.fold_in(key, epoch * 100_000 + nb)
                users, pos, neg = self._place_batch(
                    jnp.asarray(users), jnp.asarray(pos), jnp.asarray(neg))
                if (epoch == start_epoch and nb == 0
                        and os.environ.get("RAGRAPH_MEM_ANALYSIS")):
                    # device.memory_stats() is zeros through the tunnel;
                    # record XLA's compile-time accounting of the step
                    # program instead (the AOT lower re-traces, but the
                    # persistent compilation cache absorbs the compile)
                    try:
                        from ragraph_tpu.train.profiling import \
                            record_memory_analysis
                        ma = step.lower(
                            params, opt_state, users, pos, neg, k,
                            graph_arg, resources_arg).compile() \
                            .memory_analysis()
                        record_memory_analysis("edge_step", ma, self.log)
                    except Exception as e:  # noqa: BLE001 — probe only
                        self.log(f"memory analysis unavailable: {e}")
                params, opt_state, loss, _ = step(
                    params, opt_state, users, pos, neg, k, graph_arg,
                    resources_arg)
                # device scalars collected, synced once per epoch: a
                # per-step float() would add a host roundtrip per batch
                losses.append(loss)
                nb += 1
            ep_loss = float(jnp.stack(losses).sum()) if losses else 0.0
            train_time = time.time() - t0

            # evaluate
            user_emb, item_emb = self.model.generate(params)
            result = self.evaluator.evaluate(
                user_emb, item_emb, self.dataset.test_user_dict,
                self.dataset.user_hist_dict)
            history.append({"epoch": epoch, "loss": ep_loss / max(nb, 1),
                            **{m: v.tolist() for m, v in result.items()},
                            "train_time": round(train_time, 2)})
            self.log(f"epoch {epoch}: loss={ep_loss / max(nb, 1):.4f} "
                     + " ".join(f"{m}@{k}={v[i]:.4f}"
                                for m, v in result.items()
                                for i, k in enumerate(cfg.metrics_k))
                     + f" ({train_time:.1f}s)")
            epochs_run = epoch + 1

            if result["recall"][0] > best["recall"][0]:
                best = result
                best_params = params
                stop_counter = 0
            else:
                stop_counter += 1
                if stop_counter >= cfg.early_stop_patience:
                    self.log(f"early stop at epoch {epoch}; best recall "
                             f"{best['recall'][0]:.4f}")
                    break

            if resume_path and (epoch + 1) % checkpoint_every == 0:
                save_checkpoint(resume_path, {
                    "params": params, "opt_state": opt_state,
                    "best": best, "best_params": best_params,
                    "epoch": epoch, "stop_counter": stop_counter,
                }, use_orbax=False)

        return TrainResult(best_perform=best, best_params=best_params,
                           epochs_run=epochs_run, history=history)

    def evaluate_grouped(self, params):
        """Tuned/untuned user breakdown of a model
        (``RAGraph_edge/utils/metrics.py:143-209``)."""
        user_emb, item_emb = self.model.generate(params)
        out = {}
        for group in ("tuned", "untuned"):
            out[group] = self.evaluator.evaluate_grouped(
                user_emb, item_emb, self.dataset.test_user_dict,
                self.dataset.train_user_dict, self.dataset.user_hist_dict,
                group=group)
            self.log(f"[{group}] " + " ".join(
                f"{m}@{k}={v[i]:.4f}" for m, v in out[group].items()
                for i, k in enumerate(self.cfg.metrics_k)))
        return out

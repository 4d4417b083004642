"""Staged temporal fine-tuning driver.

Parity target: ``RAGraph_edge/finetune_rag.py:54-171`` — for each temporal
stage ``s`` over ``test_1..test_N``:

1. **interpolative weight update** (``:63-89``): embedding tables =
   ``0.5 * pretrain + (1-0.5) * L1-normalized-decay-weighted recents``,
   then row-L2-normalized;
2. **structural prompt** (``:109-138``): the propagation graph is the union
   of all data seen so far (pretrain + finetune + test_1..test_{s-1});
3. a ``for_tune`` model (random gating) generates frozen embeddings;
4. a ``finetune`` RAGraph (LoRA + learned gating + RAG over a resource
   graph built from the frozen embeddings on the *stage* graph) trains on
   the stage's fine-tune split with best-recall early stopping;
5. stage recall/ndcg are collected and averaged (``:167-171``).
"""

from __future__ import annotations

import dataclasses
import os
import pickle
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ragraph_tpu.data.edgelist import load_edge_dataset, merge_rows
from ragraph_tpu.models.edge.ragraph_edge import (EdgeGraphArrays,
                                                  RAGraphEdge)
from ragraph_tpu.ops.similarity import l2_normalize
from ragraph_tpu.train.trainer import EdgeTrainer


def _validate_tables(tables: dict, num_users: int, num_items: int):
    """Reject pretrain tables whose row counts don't match the data.

    An imported checkpoint for the wrong dataset (e.g. a reference
    ``pretrained_weights/*.pt`` for taobao fed to koubei data) would
    otherwise train on silently-corrupt embeddings: the user/item
    concat offsets shift and out-of-range gathers clamp, with finite
    losses throughout.
    """
    u = tables["user_embedding"].shape[0]
    i = tables["item_embedding"].shape[0]
    if (u, i) != (num_users, num_items):
        raise ValueError(
            f"pretrain tables have {u} user / {i} item rows but the "
            f"dataset has {num_users} users / {num_items} items — "
            f"wrong checkpoint for this dataset?")


def _validate_stage_ids(all_rows, num_users: int, num_items: int):
    """Reject user/item ids beyond the base scan's range.

    ``num_users``/``num_items`` are fixed from pretrain + stage 1 (the
    reference does the same: ``utils/dataloader.py:107`` takes the counts
    from the pre_dataset). An id that first appears in a LATER stage
    would silently corrupt training: a new user id collides with item
    node ``id - num_users`` in the bidirectional graph and table gathers
    clamp to the last row. Fail loudly instead.
    """
    for si, rows in enumerate(all_rows):
        if not len(rows):
            continue
        arr = np.asarray(rows, dtype=np.int64)
        u, it = int(arr[:, 0].max()), int(arr[:, 1].max())
        if u >= num_users or it >= num_items:
            raise ValueError(
                f"rows[{si}] contains user {u} / item {it} beyond the "
                f"base id range ({num_users} users / {num_items} "
                f"items fixed from pretrain + stage 1); ids appearing "
                f"only in later stages are not representable — extend "
                f"the pretrain scan or re-index the stream")


def interpolative_merge(pretrain_tables: dict, recent_tables: list,
                        pretrain_weight: float = 0.5) -> dict:
    """Merge historical checkpoints (``finetune_rag.py:63-89``).

    ``recent_tables`` is ordered most-recent-first. Weights:
    ``[w_pre, (1-w_pre)·norm1(arange(1..n)).flip()]`` — i.e. the most
    recent checkpoint gets the largest share. Rows are L2-normalized after
    merging.
    """
    if not recent_tables:
        return dict(pretrain_tables)
    n = len(recent_tables)
    decay = np.arange(1, n + 1, dtype=np.float32)
    decay = decay / decay.sum()          # F.normalize(p=1)
    decay = decay[::-1]                  # .flip: recent (first) gets max
    out = {}
    for k in ("user_embedding", "item_embedding"):
        stacked = [pretrain_tables[k]] + [t[k] for t in recent_tables]
        weights = np.concatenate([[pretrain_weight],
                                  (1 - pretrain_weight) * decay])
        merged = sum(w * t for w, t in zip(weights, stacked))
        out[k] = l2_normalize(jnp.asarray(merged), axis=1)
    return out


def _stage_state_path(checkpoint_dir: str) -> str:
    return os.path.join(checkpoint_dir, "staged_state.pkl")


def _save_stage_state(checkpoint_dir: str, state: dict) -> None:
    """Atomically persist the staged loop's carried state.

    The reference saves per-stage *models* (``finetune_rag.py:163``,
    reloaded for the interpolative merge at ``:63-66``) but the loop
    state itself (stage index, collected recalls) dies with the
    process — a crash at stage 7 of 8 restarts from stage 1. This
    checkpoints everything a stage consumes from earlier stages, so a
    resumed run reproduces the uninterrupted trajectory exactly (all
    per-stage randomness is ``fold_in(key, stage)``-derived; see
    ``tests/test_staged_resume.py`` for the bit-equality assertion).
    Write-to-temp + ``os.replace`` keeps a crash mid-write from
    corrupting the previous stage's state.
    """
    os.makedirs(checkpoint_dir, exist_ok=True)

    def _host(x):
        a = np.asarray(x)
        # scalars stay Python numbers: restored metric lists feed
        # json.dump downstream (cli.edge result files)
        return a.item() if a.ndim == 0 else a

    host = jax.tree.map(_host, state)
    path = _stage_state_path(checkpoint_dir)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(host, f)
    os.replace(tmp, path)


def _load_stage_state(checkpoint_dir: str) -> dict | None:
    path = _stage_state_path(checkpoint_dir)
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        return pickle.load(f)


@dataclasses.dataclass
class StageResult:
    recalls: list
    ndcgs: list

    @property
    def avg_recall(self):
        return float(np.mean(self.recalls))

    @property
    def avg_ndcg(self):
        return float(np.mean(self.ndcgs))


def staged_dynamic(pretrain_rows, finetune_rows, stage_rows: list,
                   pretrain_tables: dict, cfg_factory: Callable,
                   key: jax.Array, model_cls, *, mode: str = "roland",
                   hour_interval: float = 1.0,
                   num_epochs: int | None = None,
                   meta_weight: float = 0.9,
                   logger: Callable = print, mesh=None,
                   val_rows: list | None = None,
                   checkpoint_dir: str | None = None,
                   resume: bool = False,
                   stop_after_stage: int | None = None) -> "StageResult":
    """Staged training for the dynamic-GNN baselines.

    Parity with the reference's dynamic driver pattern
    (``modules/dynamicGNN/roland.py:46-77``, ``trainer_roland.py``): at
    each temporal stage the model is (re)built on the stage graph,
    initialized from the previous stage's embeddings; ROLAND additionally
    fuses against the *meta model*'s layerwise embeddings and EMA-merges
    the meta state after the stage (``new = 0.1·current + 0.9·meta``).
    """
    from ragraph_tpu.models.edge.dynamic import ema_merge

    base_ds = load_edge_dataset(
        pretrain_rows,
        val_rows if val_rows is not None else stage_rows[0],
        hour_interval=hour_interval)
    num_users, num_items = base_ds.num_users, base_ds.num_items
    _validate_tables(pretrain_tables, num_users, num_items)

    all_rows = [pretrain_rows, finetune_rows, *stage_rows]
    _validate_stage_ids(all_rows, num_users, num_items)
    recalls, ndcgs = [], []
    tables = dict(pretrain_tables)
    meta_params = None
    last_emb = None
    start_stage = 1
    if checkpoint_dir is not None and resume:
        state = _load_stage_state(checkpoint_dir)
        if state is not None:
            tables = dict(state["tables"])
            meta_params = state["meta_params"]
            last_emb = (jnp.asarray(state["last_emb"])
                        if state["last_emb"] is not None else None)
            recalls, ndcgs = list(state["recalls"]), list(state["ndcgs"])
            start_stage = int(state["stage"]) + 1
            logger(f"resuming dynamic staged loop after completed stage "
                   f"{state['stage']} ({checkpoint_dir})")
    # one edge-array shape across stages -> one compiled step (see
    # staged_finetune)
    ft_bucket = -((-2 * max(len(r) for r in all_rows[1:-1])) // 4096) * 4096

    for stage in range(start_stage, len(stage_rows) + 1):
        k_stage = jax.random.fold_in(key, stage)
        ft_idx = stage
        ft_dataset = load_edge_dataset(
            all_rows[ft_idx], stage_rows[stage - 1],
            hour_interval=hour_interval, num_users=num_users,
            num_items=num_items, phase="finetune",
            user_hist=all_rows[:ft_idx], pad_edges_to=ft_bucket)

        model = model_cls(cfg_factory("finetune"),
                          EdgeGraphArrays.from_dataset(ft_dataset),
                          phase="finetune", mesh=mesh)
        params = model.init_params(
            jax.random.fold_in(k_stage, 1),
            pretrained_tables=(jnp.asarray(tables["user_embedding"]),
                               jnp.asarray(tables["item_embedding"])))
        if meta_params is not None:
            # carry GRU weights + EMA-merged tables across stages
            params = {**params,
                      **{k: meta_params[k] for k in meta_params
                         if k in params and k != "gru"},
                      "gru": meta_params["gru"]}

        if mode == "roland":
            if hasattr(model, "forward_lgn"):
                meta_layers = model.forward_lgn(params, return_layers=True)
            else:  # plugin crosses: plain propagated layers, fusion off
                meta_layers = model.propagated_plain(params)
            model.set_meta_layers(meta_layers)
        elif mode == "evolvegcn_h":
            if last_emb is None:
                last_emb = jnp.concatenate(
                    [jnp.asarray(tables["user_embedding"]),
                     jnp.asarray(tables["item_embedding"])], axis=0)
            model.set_last_emb(last_emb)

        logger(f"--- dynamic stage {stage} ({mode})")
        trainer = EdgeTrainer(model, ft_dataset, logger=logger, mesh=mesh)
        result = trainer.train(params, jax.random.fold_in(k_stage, 2),
                               num_epochs=num_epochs,
                               rng=np.random.default_rng(stage))
        recalls.append(float(result.best_perform["recall"][0]))
        ndcgs.append(float(result.best_perform["ndcg"][0]))

        best = result.best_params
        tables = {"user_embedding": np.asarray(best["user_embedding"]),
                  "item_embedding": np.asarray(best["item_embedding"])}
        if mode == "roland":
            meta_params = (best if meta_params is None
                           else ema_merge(best, meta_params,
                                          meta_weight=meta_weight))
        else:
            meta_params = best
        u_emb, i_emb = model.generate(best)
        last_emb = jnp.concatenate([u_emb, i_emb], axis=0)
        logger(f"stage {stage}: recall={recalls[-1]:.4f} "
               f"ndcg={ndcgs[-1]:.4f}")
        if checkpoint_dir is not None:
            _save_stage_state(checkpoint_dir, {
                "stage": stage, "tables": tables,
                "meta_params": meta_params, "last_emb": last_emb,
                "recalls": recalls, "ndcgs": ndcgs})
        if stop_after_stage is not None and stage >= stop_after_stage:
            logger(f"stopping after stage {stage} (stop_after_stage)")
            break

    return StageResult(recalls=recalls, ndcgs=ndcgs)


def staged_finetune(pretrain_rows, finetune_rows, stage_rows: list,
                    pretrain_tables: dict, cfg_factory: Callable,
                    key: jax.Array, *, hour_interval: float = 1.0,
                    updt_inter: int = 1, num_epochs: int | None = None,
                    logger: Callable = print,
                    model_cls=RAGraphEdge, mesh=None,
                    val_rows: list | None = None,
                    checkpoint_dir: str | None = None,
                    resume: bool = False,
                    stop_after_stage: int | None = None) -> StageResult:
    """Run the staged loop.

    Args:
      pretrain_rows / finetune_rows / stage_rows: interaction row lists
        ((user, item, time) triples); ``stage_rows[i]`` is ``test_{i+1}``.
      pretrain_tables: {"user_embedding", "item_embedding"} from the
        pretrained model.
      cfg_factory: ``(phase: str) -> EdgeModelConfig``.
      updt_inter: how many recent stage checkpoints feed the interpolative
        merge (``args.updt_inter``).
      mesh: optional ``jax.sharding.Mesh`` — batches shard over ``dp``;
        with an ``idx`` axis > 1 the embedding tables row-shard over it
        and propagation runs the receiver-range shard_map path
        (``parallel/edge_sharded.py``).
      val_rows: the pretrain VALIDATION rows. The reference fixes the
        id space from ``EdgeListData(pretrain.txt, pretrain_val.txt)``
        (``utils/dataloader.py:107-111`` scans BOTH files), so an item
        seen only in the val split still sizes the tables; without this
        the scan falls back to pretrain + stage-1 rows and a
        val-only max id makes imported reference checkpoints fail the
        row-count validation (found by the r4 e2e edge differential at
        4000 users).
      checkpoint_dir: if set, the loop state (stage index, the last
        ``updt_inter`` stage tables, collected metrics) is atomically
        checkpointed after every stage (see :func:`_save_stage_state`).
      resume: with ``checkpoint_dir``, pick up after the last completed
        stage; the resumed trajectory is bit-equal to an uninterrupted
        run on CPU (every stage's randomness is derived from
        ``fold_in(key, stage)``, never from loop history).
      stop_after_stage: return after this stage completes (checkpoint
        still written) — chunk a long staged run across sessions, or
        inject a "crash" in tests.
    """
    base_ds = load_edge_dataset(
        pretrain_rows,
        val_rows if val_rows is not None else stage_rows[0],
        hour_interval=hour_interval)
    num_users, num_items = base_ds.num_users, base_ds.num_items
    _validate_tables(pretrain_tables, num_users, num_items)

    all_rows = [pretrain_rows, finetune_rows, *stage_rows]
    _validate_stage_ids(all_rows, num_users, num_items)
    saved_tables: list[dict] = []
    recalls, ndcgs = [], []
    start_stage = 1
    if checkpoint_dir is not None and resume:
        state = _load_stage_state(checkpoint_dir)
        if state is not None:
            saved_tables = list(state["saved_tables"])
            recalls, ndcgs = list(state["recalls"]), list(state["ndcgs"])
            start_stage = int(state["stage"]) + 1
            logger(f"resuming staged loop after completed stage "
                   f"{state['stage']} ({checkpoint_dir})")

    def _bucket(n_rows: int) -> int:
        # bidirectional edges, rounded up so every stage hits one bucket
        return -((-2 * n_rows) // 4096) * 4096

    # pad every stage's graphs to the largest stage's bucket: the edge
    # arrays then have ONE shape across the staged loop, so the train /
    # generate / eval programs compile once instead of once per stage
    prompt_bucket = _bucket(len(merge_rows(all_rows)))
    ft_bucket = _bucket(max(len(r) for r in all_rows[1:-1]) or 1)

    n_shards = (mesh.shape["idx"] if mesh is not None
                and "idx" in mesh.axis_names else 1)

    def _arrays(ds):
        g = EdgeGraphArrays.from_dataset(ds)
        return g.with_sharding(n_shards) if n_shards > 1 else g

    for stage in range(start_stage, len(stage_rows) + 1):
        k_stage = jax.random.fold_in(key, stage)
        test_idx = stage + 1
        ft_idx = test_idx - 1

        if len(saved_tables) >= updt_inter:
            merged = interpolative_merge(
                pretrain_tables, saved_tables[-updt_inter:][::-1])
        else:
            merged = dict(pretrain_tables)

        # structural prompt graph: all data up to (incl.) the ft split
        prompt_rows = merge_rows(all_rows[:ft_idx + 1])
        pre_dataset = load_edge_dataset(
            prompt_rows, all_rows[ft_idx], hour_interval=hour_interval,
            num_users=num_users, num_items=num_items,
            pad_edges_to=prompt_bucket)

        pre_model = model_cls(cfg_factory("for_tune"),
                              _arrays(pre_dataset),
                              phase="for_tune", mesh=mesh)
        # init_params supplies any non-table params the class needs for
        # generate (e.g. prompt_vec for the graphprompt crosses — fresh
        # init, matching the reference's strict=False state_dict load);
        # the tables themselves come from the interpolative merge.
        pre_params = pre_model.init_params(jax.random.fold_in(k_stage, 5))
        pre_params["user_embedding"] = merged["user_embedding"]
        pre_params["item_embedding"] = merged["item_embedding"]
        pre_u, pre_i = pre_model.generate(
            pre_params, key=jax.random.fold_in(k_stage, 1))
        # The reference draws generate() TWICE per stage: once for the
        # finetune model's init tables (modules/RAGraph.py:115) and once
        # more inside _make_resource_graph (:186) — and the for_tune
        # random gate resamples its weights per call (:177-183), so the
        # library base and the init tables carry INDEPENDENT gate draws.
        # Reusing one draw correlates the library with the query tables
        # (found by the r4 e2e edge differential).
        res_u, res_i = pre_model.generate(
            pre_params, key=jax.random.fold_in(k_stage, 6))

        ft_dataset = load_edge_dataset(
            all_rows[ft_idx], stage_rows[stage - 1],
            hour_interval=hour_interval, num_users=num_users,
            num_items=num_items, phase="finetune",
            user_hist=all_rows[:ft_idx], pad_edges_to=ft_bucket)

        model = model_cls(cfg_factory("finetune"),
                          _arrays(ft_dataset),
                          phase="finetune", mesh=mesh)
        if model.use_rag:
            model.make_resource_graph(res_u, res_i,
                                      jax.random.fold_in(k_stage, 2))
        params = model.init_params(jax.random.fold_in(k_stage, 3),
                                   pretrained_tables=(pre_u, pre_i))

        logger(f"--- stage {stage}: ft rows={len(all_rows[ft_idx])} "
               f"test users={len(ft_dataset.test_user_dict)}")
        trainer = EdgeTrainer(model, ft_dataset, logger=logger, mesh=mesh)
        result = trainer.train(params, jax.random.fold_in(k_stage, 4),
                               num_epochs=num_epochs,
                               rng=np.random.default_rng(stage))

        recalls.append(float(result.best_perform["recall"][0]))
        ndcgs.append(float(result.best_perform["ndcg"][0]))
        saved_tables.append({
            "user_embedding": np.asarray(
                result.best_params["user_embedding"]),
            "item_embedding": np.asarray(
                result.best_params["item_embedding"]),
        })
        logger(f"stage {stage}: recall={recalls[-1]:.4f} "
               f"ndcg={ndcgs[-1]:.4f}")
        if checkpoint_dir is not None:
            # only the last updt_inter tables feed future merges — the
            # checkpoint stays O(updt_inter) regardless of stage count
            _save_stage_state(checkpoint_dir, {
                "stage": stage,
                "saved_tables": saved_tables[-updt_inter:],
                "recalls": recalls, "ndcgs": ndcgs})
        if stop_after_stage is not None and stage >= stop_after_stage:
            logger(f"stopping after stage {stage} (stop_after_stage)")
            break

    return StageResult(recalls=recalls, ndcgs=ndcgs)

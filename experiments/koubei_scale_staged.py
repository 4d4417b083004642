"""Staged fine-tune protocol at koubei's PUBLISHED scale (VERDICT r3 #2).

experiments/koubei_scale_dryrun.py proves the vanilla huge-k fusion at
koubei scale; this exercises the part scale bugs actually live in — the
STAGED protocol of ``RAGraph_edge/finetune_rag.py:61-171``: per-stage
structural-prompt merge + library rebuild, interpolative checkpoint
merge, train epochs, and a full-catalog eval over the ~101k-item catalog
per stage — end-to-end through ``models/edge/staged.staged_finetune``.

Data: synthetic planted-cluster interactions at koubei dims (119,958
users × 101,404 items; 1.5M pretrain + 300k fine-tune + 4 stages of
300k). Users prefer items of their own cluster with p=0.8, so stage
recall@20 has a learnable floor ≫ the 20/101,404 ≈ 2e-4 chance — the
eval asserts ≥ half the planted-structure ceiling of
0.8·20/(I/C) ≈ 7.9e-3 (non-vacuous by construction, VERDICT weak
spot 2; the first r4 run hit 98% of that ceiling).

Epoch counts are small (this is a scale/e2e proof, not a convergence
study); per-stage wall/eval seconds and the planted-signal recalls land
in results/koubei_scale_staged.json + a SCALING.md section.

Usage: python experiments/koubei_scale_staged.py   (real TPU, ~20 min)
"""

import json
import os
import time

import numpy as np

SAVE = "results"
U, I = 119_958, 101_404          # koubei published dims
M_PRE = 1_500_000
M_STAGE = 300_000
N_STAGES = 4
STAGE_USERS = 30_000             # test users per stage (eval transfer
                                 # through the ~100 KB/s tunnel scales
                                 # with this; real koubei stages are a
                                 # subset of users too)
CLUSTERS = 50
PRETRAIN_EPOCHS = 3
STAGE_EPOCHS = 3
FINAL_STAGE_EPOCH_CAP = 60       # stage 4: high cap so the patience-10
                                 # early stop is what actually ends it
EMB = 64


def planted_rows(rng, n_rows, users_pool, user_cluster, items_sorted,
                 offsets, sizes, t0):
    """Vectorized cluster-preferential interaction draw."""
    users = rng.choice(users_pool, n_rows)
    cl = user_cluster[users]
    own = rng.random(n_rows) < 0.8
    within = rng.integers(0, 1 << 62, n_rows) % sizes[cl]
    own_items = items_sorted[offsets[cl] + within]
    rand_items = rng.integers(0, I, n_rows)
    items = np.where(own, own_items, rand_items)
    times = t0 + rng.integers(0, 900_000, n_rows)
    return list(zip(users.tolist(), items.tolist(), times.tolist()))


def main():
    import jax
    import jax.random as jr

    from ragraph_tpu.data import load_edge_dataset
    from ragraph_tpu.models.edge import (EdgeGraphArrays, RAGraphEdge,
                                         edge_config_for, staged_finetune)
    from ragraph_tpu.train import EdgeTrainer, RunLogger

    log = RunLogger(exp_name="koubei-scale-staged")
    rng = np.random.default_rng(0)

    user_cluster = rng.integers(0, CLUSTERS, U)
    item_cluster = rng.integers(0, CLUSTERS, I)
    order = np.argsort(item_cluster, kind="stable")
    items_sorted = order.astype(np.int64)
    sizes = np.bincount(item_cluster, minlength=CLUSTERS)
    offsets = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    assert sizes.min() > 0

    all_users = np.arange(U)
    t0 = 1_600_000_000
    pretrain_rows = planted_rows(rng, M_PRE, all_users, user_cluster,
                                 items_sorted, offsets, sizes, t0)
    ft_rows = planted_rows(rng, M_STAGE, all_users, user_cluster,
                           items_sorted, offsets, sizes, t0 + 10**6)
    stage_rows = []
    for s in range(N_STAGES):
        stage_users = rng.choice(all_users, STAGE_USERS, replace=False)
        stage_rows.append(planted_rows(
            rng, M_STAGE, stage_users, user_cluster, items_sorted,
            offsets, sizes, t0 + (2 + s) * 10**6))
    log(f"koubei-scale planted data: {U}x{I}, {M_PRE} pretrain + "
        f"{N_STAGES}x{M_STAGE} stage rows, {CLUSTERS} clusters")

    def cfg_factory(phase, **kw):
        return edge_config_for("koubei", phase, emb_size=EMB,
                               num_layers=3, edge_dropout=0.5, lr=1e-3,
                               early_stop_patience=10,
                               eval_batch_size=512, **kw)

    # ---- pretrain (few epochs: scale proof, not convergence) ----
    # ensure the id space is covered for the staged loop (library dims)
    num_users = U
    num_items = I
    val_cut = len(pretrain_rows) - 50_000
    ds = load_edge_dataset(pretrain_rows[:val_cut],
                           [(u, i) for (u, i, _) in pretrain_rows[val_cut:]],
                           num_users=num_users, num_items=num_items)
    model = RAGraphEdge(cfg_factory("pretrain"),
                        EdgeGraphArrays.from_dataset(ds), phase="pretrain")
    params = model.init_params(jr.key(0))
    trainer = EdgeTrainer(model, ds, logger=log)
    t_start = time.time()
    result = trainer.train(params, jr.key(1),
                           num_epochs=PRETRAIN_EPOCHS, rng=rng)
    t_pre = time.time() - t_start
    pre_recall = float(result.best_perform["recall"][0])
    log(f"pretrain: {t_pre:.0f}s, planted-val recall@20 {pre_recall:.4f}")
    tables = {"user_embedding": np.asarray(
                  result.best_params["user_embedding"]),
              "item_embedding": np.asarray(
                  result.best_params["item_embedding"])}

    # ---- staged fine-tune, full protocol ----
    stage_marks = []

    def marking_logger(msg):
        stage_marks.append((round(time.time() - t_start, 1), str(msg)))
        log(msg)

    t_start = time.time()
    # per-stage checkpointing: at 245 s/stage a mid-run tunnel stall or
    # timeout no longer restarts the protocol — rerunning this script
    # with RESUME=1 continues after the last completed stage (the
    # synthetic stream is seed-deterministic, so the resumed trajectory
    # is the uninterrupted one; tests/test_staged_resume.py pins this).
    # r5 (VERDICT r4 item 5): stages 1-3 run the quick scale proof
    # (STAGE_EPOCHS); stage 4 then RESUMES with a large epoch cap so the
    # patience-10 early stop triggers LIVE at koubei scale — the recall
    # saturates at the planted ceiling, the best-recall ratchet stalls,
    # and the stage must end on the early-stop path, not the epoch cap.
    ckpt = "/tmp/koubei_staged_ckpt"
    common = dict(cfg_factory=lambda phase: cfg_factory(phase),
                  key=jr.key(2), logger=marking_logger,
                  checkpoint_dir=ckpt)
    staged_finetune(pretrain_rows, ft_rows, stage_rows, tables,
                    num_epochs=STAGE_EPOCHS, stop_after_stage=3,
                    resume=bool(os.environ.get("RESUME")), **common)
    res = staged_finetune(pretrain_rows, ft_rows, stage_rows, tables,
                          num_epochs=FINAL_STAGE_EPOCH_CAP, resume=True,
                          **common)
    t_staged = time.time() - t_start
    early_stop_lines = [m for m in stage_marks
                        if "early stop at epoch" in m[1]]
    assert early_stop_lines, (
        f"stage 4 ran all {FINAL_STAGE_EPOCH_CAP} epochs without the "
        "patience-10 early stop triggering")
    log(f"early stop triggered: {early_stop_lines[-1][1]}")

    chance = 20.0 / I
    # Planted-structure CEILING, not just a floor: a perfect
    # cluster-identifying model ranks 20 of the ~I/CLUSTERS own-cluster
    # items; a test positive is own-cluster w.p. 0.8 and uniform w.p.
    # 0.2, so recall@20 tops out at 0.8*20/(I/C) + 0.2*20/I ~= 7.9e-3
    # (~40x chance — the original 50x-chance assert sat ABOVE this and
    # would fail a perfect model; the first r4 run measured 0.0078 =
    # 98% of ceiling). Assert at half-ceiling: real structure learned,
    # no flake room.
    ceiling = 0.8 * 20.0 / (I / CLUSTERS) + 0.2 * chance
    log(f"staged: {t_staged:.0f}s; recalls {res.recalls} "
        f"(chance {chance:.2e}, planted ceiling {ceiling:.2e})")
    for r in res.recalls:
        assert r > 0.5 * ceiling, (
            f"stage recall {r} under half the planted-signal ceiling "
            f"{0.5 * ceiling:.2e}")

    # device.memory_stats() reports zeros through the axon tunnel; the
    # honest HBM accounting is XLA's compile-time memory_analysis of the
    # hot programs, recorded by EdgeTrainer under RAGRAPH_MEM_ANALYSIS=1
    # (set below in __main__) — peak = the largest per-program live set
    # plus the resident tables/optimizer state the programs alias.
    from ragraph_tpu.train.profiling import MEMORY_ANALYSES
    peak_live = max((m["live_bytes"] for m in MEMORY_ANALYSES), default=0)
    out = {
        "num_users": U, "num_items": I,
        "pretrain_rows": M_PRE, "stage_rows": M_STAGE,
        "n_stages": N_STAGES, "stage_test_users": STAGE_USERS,
        "pretrain_epochs": PRETRAIN_EPOCHS, "stage_epochs": STAGE_EPOCHS,
        "pretrain_wall_s": round(t_pre, 1),
        "pretrain_recall": pre_recall,
        "staged_wall_s": round(t_staged, 1),
        "staged_wall_per_stage_s": round(t_staged / N_STAGES, 1),
        "recalls": res.recalls, "ndcgs": res.ndcgs,
        "avg_recall": res.avg_recall, "avg_ndcg": res.avg_ndcg,
        "recall_chance": chance, "recall_ceiling": ceiling,
        "final_stage_epoch_cap": FINAL_STAGE_EPOCH_CAP,
        "early_stop_line": early_stop_lines[-1][1],
        "peak_hbm_gib": round(peak_live / 2**30, 3),
        "memory_analyses": MEMORY_ANALYSES,
        "stage_log": stage_marks,
    }
    os.makedirs(SAVE, exist_ok=True)
    with open(os.path.join(SAVE, "koubei_scale_staged.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: out[k] for k in
                      ("pretrain_wall_s", "staged_wall_s", "recalls",
                       "avg_recall", "recall_chance")}))


if __name__ == "__main__":
    os.environ.setdefault("RAGRAPH_MEM_ANALYSIS", "1")
    from ragraph_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    main()

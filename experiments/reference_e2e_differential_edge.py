"""Edge arm of the head-to-head e2e differential (VERDICT r3 item 1).

Runs the reference's ``RAGraph_edge/finetune_rag.py:54-171`` staged
protocol — interpolative merge, structural-prompt dataset (merge_pd
left-join quirk included), RAGraph(phase='finetune') with default LoRA,
Trainer.train_finetune with best-recall early stopping, full-catalog
recall@20/ndcg@20 per stage — with the reference's OWN torch classes on
CPU, next to ``cli.edge finetune --lora svd`` on the SAME subsampled
amazon split, starting from the SAME pretrained checkpoint (the
reference's own GraphPro, pretrained here via its pretrain.py protocol
and imported on our side through train/torch_import).

Subsample (``make_amazon_sub``): N users drawn from
pretrain_val ∩ fine_tune users; interactions restricted to items seen in
the (subsampled) pretrain graph so the reference's
pre_dataset-dimensioned id space covers every stage; pretrain_val split
temporally 80/20 into pretrain/val exactly as experiments/amazon_real.py
does at full scale (the true pretrain.txt is stripped from the snapshot).

Run: ``python experiments/reference_e2e_differential.py edge``
Results: results/reference_e2e_differential_edge.json
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import torch

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tests"))

SRC = "/root/reference/RAGraph_edge/dataset/amazon"
SUB_DIR = "/tmp/amazon_sub"
N_USERS = 4000
SEEDS = (2023, 7, 13)  # training seeds; subsample is fixed (seed 7)
N_STAGES = 4          # "amazon_sub" basename → 4 stages on both sides
EMB = 64
BATCH_SIZE = 1024     # subsample-scale batch (2048 default would leave
                      # the reference's `while s+bs <= num_edges` loop
                      # with ~1 batch/epoch); matched on both sides
NUM_EPOCHS = 60       # early-stop patience 10 governs in practice
PATIENCE = 10
SEED = 2023           # parse_args.py:32 default


def _force_cpu():
    import jax
    jax.config.update("jax_platforms", "cpu")


# ---------------------------------------------------------------------------
# subsampled amazon split (deterministic, written to SUB_DIR)
# ---------------------------------------------------------------------------
def _parse_grouped(path):
    rows = {}
    with open(path) as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            u = int(parts[0])
            items = [int(x) for x in parts[1].split(" ")]
            times = ([int(x) for x in parts[2].split(" ")]
                     if len(parts) > 2 else [0] * len(items))
            rows[u] = (items, times)
    return rows


def _write_grouped(path, rows):
    with open(path, "w") as f:
        for u in sorted(rows):
            items, times = rows[u]
            f.write(f"{u}\t{' '.join(map(str, items))}"
                    f"\t{' '.join(map(str, times))}\n")


def make_amazon_sub(out_dir, n_users, seed=7):
    pv = _parse_grouped(os.path.join(SRC, "pretrain_val.txt"))
    ft = _parse_grouped(os.path.join(SRC, "fine_tune.txt"))
    tests = [_parse_grouped(os.path.join(SRC, f"test_{i}.txt"))
             for i in range(1, N_STAGES + 1)]

    cand = sorted(set(pv) & set(ft))
    rng = np.random.default_rng(seed)
    users = sorted(rng.choice(cand, n_users, replace=False).tolist())
    umap = {u: i for i, u in enumerate(users)}
    keep = set(users)

    pv2 = {u: pv[u] for u in users}
    # item space = every item the sampled users ever touch. The reference
    # sizes every stage dataset from the pretrain dataset's (num_users,
    # num_items), so the GLOBALLY max item index must appear in
    # pretrain.txt/pretrain_val.txt — order the index assignment so
    # pretrain-seen items get the highest ids (the real amazon
    # pretrain.txt covers the catalog the same way; items unseen at
    # pretrain keep their random embeddings, identically on both sides).
    pv_items = {i for u in pv2 for i in pv2[u][0]}
    other_items = sorted({i for d in (ft, *tests) for u in d if u in keep
                          for i in d[u][0]} - pv_items)
    items = other_items + sorted(pv_items)
    imap = {it: j for j, it in enumerate(items)}

    def remap(d):
        out = {}
        for u, (its, ts) in d.items():
            if u not in keep:
                continue
            pairs = [(imap[i], t) for i, t in zip(its, ts)]
            out[umap[u]] = ([p[0] for p in pairs], [p[1] for p in pairs])
        return out

    # temporal 80/20 split of the subsampled pretrain_val into
    # pretrain/val (amazon_real.load_rows semantics — the real
    # pretrain.txt is stripped from the snapshot)
    flat = [(umap[u], imap[i], t)
            for u in pv2 for i, t in zip(*pv2[u])]
    flat.sort(key=lambda r: r[2])
    cut = int(0.8 * len(flat))

    def regroup(rows):
        d = {}
        for u, i, t in rows:
            d.setdefault(u, ([], []))
            d[u][0].append(i)
            d[u][1].append(t)
        return d

    os.makedirs(out_dir, exist_ok=True)
    _write_grouped(os.path.join(out_dir, "pretrain.txt"),
                   regroup(flat[:cut]))
    _write_grouped(os.path.join(out_dir, "pretrain_val.txt"),
                   regroup(flat[cut:]))
    _write_grouped(os.path.join(out_dir, "fine_tune.txt"), remap(ft))
    for i, t in enumerate(tests, start=1):
        _write_grouped(os.path.join(out_dir, f"test_{i}.txt"), remap(t))
    stats = {"num_users": n_users, "num_items": len(items),
             "pretrain_covered_items": len(pv_items),
             "pretrain_edges": cut, "val_edges": len(flat) - cut,
             "ft_users": len(remap(ft)),
             "stage_users": [len(remap(t)) for t in tests]}
    print(f"[subsample] {stats}")
    return stats


# ---------------------------------------------------------------------------
# reference side: pretrain.py + finetune_rag.py protocols, torch-CPU
# ---------------------------------------------------------------------------
class FakeLogger:
    """The 4 methods Trainer/driver call on the reference Logger."""

    def log(self, msg, **kw):
        print(f"[ref] {msg}")

    def info(self, msg, **kw):
        print(f"[ref] {msg}")

    def log_loss(self, epoch, d, **kw):
        if epoch % 10 == 0:
            print(f"[ref] epoch {epoch}: {d}")

    def log_eval(self, result, k, **kw):
        pass


def _configure_ref_args(ref, save_dir):
    a = ref.edge_args
    a.device = "cpu"
    a.data_path = SUB_DIR          # 'amazon' substring → amazon branch
    a.emb_size = EMB
    a.num_layers = 3
    a.lr = 1e-3
    a.weight_decay = 1e-4
    a.batch_size = BATCH_SIZE
    a.eval_batch_size = 256
    a.metrics = "recall;ndcg"
    a.metrics_k = "20"
    a.num_epochs = NUM_EPOCHS
    a.early_stop_patience = PATIENCE
    a.edge_dropout = 0.5
    a.emb_dropout = 0.0
    a.neg_num = 1
    a.hour_interval_pre = 1.0
    a.hour_interval_f = 1
    a.updt_inter = 1
    a.seed = SEED
    a.log = 1                      # Trainer.save_model gates on this
    a.save_dir = save_dir
    a.exp_time = "stage-0"
    return a


def _init_seed(seed):
    """utility.py:7-14 (torch.cuda calls are no-ops on CPU builds)."""
    import random
    random.seed(seed)
    np.random.seed(seed)
    torch.manual_seed(seed)


def reference_pretrain(ref, save_dir, seed=SEED):
    """``RAGraph_edge/pretrain.py:53-62``: GraphPro on pretrain.txt,
    eval on pretrain_val, best-recall early stop; best state saved by
    Trainer.save_model. Returns the saved .pt path."""
    a = _configure_ref_args(ref, save_dir)
    a.seed = seed
    a.exp_time = f"pretrain-{seed}"
    _init_seed(seed)
    logger = FakeLogger()
    dataset = ref.edge_EdgeListData(
        os.path.join(SUB_DIR, "pretrain.txt"),
        os.path.join(SUB_DIR, "pretrain_val.txt"))
    model = ref.edge_GraphPro(dataset, phase="pretrain")
    trainer = ref.edge_Trainer(dataset, logger)
    best = trainer.train(model)
    print(f"[ref] pretrain best recall@20 {best['recall'][0]:.5f}")
    path = getattr(trainer, "save_path", None)
    if path is None:  # recall never improved past 0 — save final state
        path = os.path.join(save_dir, f"pretrain_final_{seed}.pt")
        torch.save(model.state_dict(), path)
    return path, float(best["recall"][0])


def reference_staged_finetune(ref, pre_model_path, save_dir, seed=SEED):
    """``RAGraph_edge/finetune_rag.py:54-171`` faithfully (the
    interpolative-update block executes the reference's own source via
    interpolative_merge_reference)."""
    import pandas as pd

    from _reference_loader import interpolative_merge_reference

    a = _configure_ref_args(ref, save_dir)
    a.pre_model_path = pre_model_path
    a.seed = seed
    _init_seed(seed)
    logger = FakeLogger()

    pretrain_data = os.path.join(SUB_DIR, "pretrain.txt")
    pretrain_val_data = os.path.join(SUB_DIR, "pretrain_val.txt")
    finetune_data = os.path.join(SUB_DIR, "fine_tune.txt")
    test_datas = [os.path.join(SUB_DIR, f"test_{i}.txt")
                  for i in range(1, N_STAGES + 1)]
    all_data = [pretrain_data, finetune_data, *test_datas]

    pretrain_dataset = ref.edge_EdgeListData(pretrain_data,
                                             pretrain_val_data)
    saved_model_paths = []
    recalls, ndcgs = [], []
    for num_stage in range(1, len(test_datas) + 1):
        interval = a.updt_inter
        if len(saved_model_paths) >= interval:
            all_state_dict = [torch.load(a.pre_model_path,
                                         map_location="cpu")]
            for i in range(interval):
                all_state_dict.append(
                    torch.load(saved_model_paths[-i - 1],
                               map_location="cpu"))
            state_dict = interpolative_merge_reference(
                all_state_dict, interval)
        else:
            state_dict = torch.load(a.pre_model_path)

        new_state_dict = {k: v for k, v in state_dict.items()
                          if any(k.startswith(s) for s in
                                 ["user_embedding", "item_embedding"])}

        test_data_idx = num_stage + 1
        ft_data_idx = test_data_idx - 1
        logger.info(f"Finetune Stage {num_stage}, test "
                    f"{all_data[test_data_idx]}, ft {all_data[ft_data_idx]}")

        pretrain_df = pd.read_csv(pretrain_data, sep="\t",
                                  names=["user", "item", "time"])
        all_data_pd = [
            pretrain_df,
            pd.read_csv(finetune_data, sep="\t",
                        names=["user", "item", "time"]),
            *[pd.read_csv(td, sep="\t", names=["user", "item", "time"])
              for td in test_datas],
        ]
        merged_pre_pd = ref.edge_merge_pd(all_data_pd[:ft_data_idx + 1])

        pre_dataset = ref.edge_EdgeListData(
            train_file=merged_pre_pd, test_file=all_data_pd[ft_data_idx],
            has_time=True, pre_dataset=pretrain_dataset)

        pretrained_model = ref.edge_RAGraph(pre_dataset, phase="for_tune")
        pretrained_model.load_state_dict(new_state_dict, strict=True)
        pretrained_model.eval()

        finetune_dataset = ref.edge_EdgeListData(
            train_file=all_data[ft_data_idx],
            test_file=os.path.join(SUB_DIR, f"test_{num_stage}.txt"),
            phase="finetune", pre_dataset=pre_dataset, has_time=True,
            user_hist_files=all_data[:ft_data_idx])
        model = ref.edge_RAGraph(finetune_dataset, pretrained_model,
                                 phase="finetune")

        trainer = ref.edge_Trainer(finetune_dataset, logger,
                                   pre_dataset=pretrain_dataset)
        best_perform = trainer.train_finetune(model, pretrained_model)

        recalls.append(float(best_perform["recall"][0]))
        ndcgs.append(float(best_perform["ndcg"][0]))
        print(f"[ref] stage {num_stage}: recall {recalls[-1]:.5f} "
              f"ndcg {ndcgs[-1]:.5f}")
        path = getattr(trainer, "save_path", None)
        if path is None:  # recall never beat 0 — keep final state anyway
            path = os.path.join(save_dir,
                                f"stage_{seed}_{num_stage}_final.pt")
            torch.save(model.state_dict(), path)
        saved_model_paths.append(path)
        a.exp_time = f"s{seed}-stage-{num_stage}"
    return recalls, ndcgs


# ---------------------------------------------------------------------------
def run_edge():
    _force_cpu()
    from _reference_loader import load_reference

    from ragraph_tpu.cli import edge as edge_cli

    stats = make_amazon_sub(SUB_DIR, N_USERS)
    save_dir = "/tmp/amazon_sub_ref_ckpt"
    os.makedirs(save_dir, exist_ok=True)
    ref = load_reference()

    per_seed = []
    for seed in SEEDS:
        t0 = time.time()
        pre_path, pre_recall = reference_pretrain(ref, save_dir,
                                                  seed=seed)
        ref_recalls, ref_ndcgs = reference_staged_finetune(
            ref, pre_path, save_dir, seed=seed)
        t_ref = time.time() - t0
        ref_avg_r = float(np.mean(ref_recalls))
        print(f"[ref seed {seed}] avg recall {ref_avg_r:.5f} "
              f"({t_ref:.0f}s)")

        # ours: cli.edge finetune from the SAME per-seed checkpoint,
        # strict-parity LoRA (the reference defaults LoRA+SVD on)
        t0 = time.time()
        result = edge_cli.main([
            "finetune", "--data-path", SUB_DIR,
            "--pre-model-path", pre_path,
            "--emb-size", str(EMB), "--epochs", str(NUM_EPOCHS),
            "--batch-size", str(BATCH_SIZE),
            "--patience", str(PATIENCE), "--lora", "svd",
            "--seed", str(seed), "--save-dir", "/tmp/amazon_sub_ours"])
        t_ours = time.time() - t0
        print(f"[ours seed {seed}] avg recall {result.avg_recall:.5f} "
              f"({t_ours:.0f}s)")
        per_seed.append({
            "seed": seed, "pretrain_recall": pre_recall,
            "reference": {"recalls": ref_recalls, "ndcgs": ref_ndcgs,
                          "avg_recall": ref_avg_r,
                          "avg_ndcg": float(np.mean(ref_ndcgs)),
                          "wall_s": round(t_ref, 1)},
            "ours": {"recalls": result.recalls, "ndcgs": result.ndcgs,
                     "avg_recall": result.avg_recall,
                     "avg_ndcg": result.avg_ndcg,
                     "wall_s": round(t_ours, 1)},
        })

    ref_avgs = [s["reference"]["avg_recall"] for s in per_seed]
    our_avgs = [s["ours"]["avg_recall"] for s in per_seed]
    ref_mean, our_mean = float(np.mean(ref_avgs)), float(np.mean(our_avgs))
    # combined seed noise (legacy diagnostic): sum of per-arm stds
    noise = float(np.std(ref_avgs) + np.std(our_avgs))
    # proper two-sample criterion: standard error of the mean
    # difference, sample (ddof=1) variances. The r3 script's
    # max(2*noise, 0.2*ref_mean) let a 3-sigma systematic gap pass as
    # "within noise" through the 20%-of-mean escape hatch (judge
    # finding) — that hatch is gone.
    n = len(SEEDS)
    se = float(np.sqrt(np.var(ref_avgs, ddof=1) / n
                       + np.var(our_avgs, ddof=1) / n))
    gap = our_mean - ref_mean
    out = {
        "subsample": stats,
        "config": {"emb_size": EMB, "num_epochs": NUM_EPOCHS,
                   "batch_size": BATCH_SIZE,
                   "patience": PATIENCE, "stages": N_STAGES,
                   "seeds": list(SEEDS),
                   "lora": "svd (reference default)",
                   "shared_pretrain": "reference GraphPro pretrain.py "
                                      "protocol, per seed"},
        "per_seed": per_seed,
        "reference": {"avg_recall": ref_mean,
                      "avg_recall_std": float(np.std(ref_avgs)),
                      "avg_ndcg": float(np.mean(
                          [s["reference"]["avg_ndcg"] for s in per_seed]))},
        "ours": {"avg_recall": our_mean,
                 "avg_recall_std": float(np.std(our_avgs)),
                 "avg_ndcg": float(np.mean(
                     [s["ours"]["avg_ndcg"] for s in per_seed]))},
        "gap": gap,
        "rel_gap": gap / max(ref_mean, 1e-12),
        "combined_seed_std": noise,
        "gap_se": se,
        "gap_sigma": gap / max(se, 1e-12),
        "within_noise": bool(abs(gap) <= 2.0 * se),
    }
    os.makedirs("results", exist_ok=True)
    with open("results/reference_e2e_differential_edge.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: out[k] for k in
                      ("gap", "rel_gap", "gap_se", "gap_sigma",
                       "within_noise")}))
    return out


if __name__ == "__main__":
    run_edge()

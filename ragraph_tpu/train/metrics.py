"""Ranking metrics: recall / ndcg / precision / mrr @ k with history masking.

Parity target: ``Metric`` (``RAGraph_edge/utils/metrics.py:7-214``) —
full-catalog ranking per test user, history positions masked to ``-1e8``
(``:210-214``), metric math identical (``:12-46``), including the
tuned/untuned user breakdown (``:143-209``).

TPU-native split: the ``(B, I)`` rating matmul, history masking, and top-k
run jitted on device; the ragged ground-truth bookkeeping stays in NumPy on
host (it is O(test edges), not a bottleneck).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("k", "method"))
def _rate_and_topk(user_emb_batch, item_emb, hist_rows, hist_cols, k: int,
                   method: str = "exact"):
    """Score one user batch, mask history, return top-k item indices.

    ``method='approx'`` uses the TPU PartialReduce (``lax.approx_max_k``,
    recall_target 0.99) — at 100k+ item catalogs the exact sort dominates
    eval time; the ranking metrics move by well under the seed noise.
    """
    scores = jnp.dot(user_emb_batch, item_emb.T,
                     preferred_element_type=jnp.float32)
    # padding entries carry out-of-bounds columns; mode="drop" ignores them
    scores = scores.at[hist_rows, hist_cols].set(-1e8, mode="drop")
    if method == "approx":
        _, idx = jax.lax.approx_max_k(scores, k, recall_target=0.99)
    else:
        _, idx = jax.lax.top_k(scores, k)
    return idx


def _pad_history(users, user_hist_dict, num_items):
    """Flatten per-user histories into (row, col) index arrays.

    Padded to the next power of two so the jitted masking kernel compiles
    per size bucket, not per batch; padding entries use an out-of-bounds
    column which ``mode="drop"`` scatters ignore.
    """
    rows, cols = [], []
    for r, u in enumerate(users):
        for i in user_hist_dict.get(int(u), ()):
            rows.append(r)
            cols.append(i)
    rows = np.asarray(rows, np.int32)
    cols = np.asarray(cols, np.int32)
    target = max(1, 1 << (max(len(rows), 1) - 1).bit_length())
    pad = target - len(rows)
    if pad:
        rows = np.concatenate([rows, np.zeros(pad, np.int32)])
        cols = np.concatenate([cols, np.full(pad, num_items, np.int32)])
    return rows, cols


def recall_at_k(hits, test_lens, k):
    return (hits[:, :k].sum(1) / test_lens).sum()


def precision_at_k(hits, k):
    return hits[:, :k].sum() / k


def mrr_at_k(hits, k, compat=False):
    """Standard MRR: 1/rank of the first hit within top-k.

    Deliberate deviation: the reference (``metrics.py:24-29``) divides by
    ``log2(1/rank)`` which is 0 at rank 1 (division by zero); mrr is not in
    its default metric set, so the bug never fires there. We implement the
    textbook definition by default.

    ``compat=True`` reproduces the reference formula bit-for-bit
    (``RAGraph_edge/utils/metrics.py:24-29``) so all four ranking metrics
    can be compared numerically in head-to-head differentials: a rank-1
    hit contributes ``inf`` (1/log2(1)=1/0) and a rank-1 miss ``nan``
    (0/0), exactly as the reference's numpy evaluates it.
    """
    if compat:
        with np.errstate(divide="ignore", invalid="ignore"):
            scores = np.log2(1.0 / np.arange(1, k + 1))
            pred = hits[:, :k] / scores
        return pred.sum(1).sum()
    ranks = np.arange(1, k + 1, dtype=np.float32)
    first_hit = np.where(hits[:, :k] > 0, 1.0 / ranks, 0.0).max(axis=1)
    return first_hit.sum()


def ndcg_at_k(hits, test_lens, k):
    pred = hits[:, :k]
    discount = 1.0 / np.log2(np.arange(2, k + 2))
    dcg = (pred * discount).sum(1)
    idcg = np.array([discount[: min(int(n), k)].sum() for n in test_lens])
    idcg[idcg == 0.0] = 1.0
    ndcg = dcg / idcg
    ndcg[np.isnan(ndcg)] = 0.0
    return ndcg.sum()


class RankingEvaluator:
    """Full-catalog ranking eval over a test user dict."""

    def __init__(self, metrics=("recall", "ndcg"), ks=(20,),
                 eval_batch_size: int = 512, topk_method: str = "auto",
                 mrr_compat: bool = False):
        self.metrics = tuple(metrics)
        self.ks = tuple(int(k) for k in ks)
        self.eval_batch_size = eval_batch_size
        # "auto": approx_max_k above 32k items (see _rate_and_topk)
        self.topk_method = topk_method
        # reference-exact mrr formula (see mrr_at_k docstring)
        self.mrr_compat = mrr_compat

    def evaluate(self, user_emb, item_emb, test_user_dict, user_hist_dict,
                 users=None):
        """Returns {metric: np.array over ks} averaged over test users."""
        if users is None:
            users = list(test_user_dict.keys())
        num_users = len(users)
        num_items = item_emb.shape[0]
        max_k = max(self.ks)
        result = {m: np.zeros(len(self.ks)) for m in self.metrics}
        if num_users == 0:
            return result

        method = self.topk_method
        if method == "auto":
            method = "approx" if num_items >= 32_768 else "exact"

        # dispatch every batch asynchronously and pull ALL top-k ids in a
        # single device->host transfer at the end (the tunneled-TPU setup
        # pays a large fixed latency per transfer)
        topks = []
        for s in range(0, num_users, self.eval_batch_size):
            batch_users = users[s:s + self.eval_batch_size]
            ue = user_emb[jnp.asarray(np.asarray(batch_users, np.int32))]
            rows, cols = _pad_history(batch_users, user_hist_dict, num_items)
            topks.append(_rate_and_topk(
                ue, item_emb, jnp.asarray(rows), jnp.asarray(cols), max_k,
                method=method))
        all_topk = np.asarray(jnp.concatenate(topks, axis=0))

        # hit matrix vs ground truth (host, ragged)
        hits = np.zeros((num_users, max_k), np.float32)
        test_lens = np.zeros(num_users, np.float32)
        for r, u in enumerate(users):
            gt = set(test_user_dict[int(u)])
            test_lens[r] = len(gt)
            for c in range(max_k):
                if all_topk[r, c] in gt:
                    hits[r, c] = 1.0

        for ki, k in enumerate(self.ks):
            for m in self.metrics:
                if m == "recall":
                    result[m][ki] = recall_at_k(hits, test_lens, k)
                elif m == "ndcg":
                    result[m][ki] = ndcg_at_k(hits, test_lens, k)
                elif m == "precision":
                    result[m][ki] = precision_at_k(hits, k)
                elif m == "mrr":
                    result[m][ki] = mrr_at_k(hits, k,
                                             compat=self.mrr_compat)

        for m in self.metrics:
            result[m] = result[m] / num_users
        return result

    def evaluate_grouped(self, user_emb, item_emb, test_user_dict,
                         train_user_dict, user_hist_dict,
                         group: str = "tuned"):
        """Tuned/untuned split (``metrics.py:143-209``)."""
        tuned = set(train_user_dict) & set(test_user_dict)
        users = (sorted(tuned) if group == "tuned"
                 else sorted(set(test_user_dict) - set(train_user_dict)))
        return self.evaluate(user_emb, item_emb, test_user_dict,
                             user_hist_dict, users=users)

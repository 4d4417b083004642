"""Importer for the reference's ``.pt`` pretrained-weight checkpoints.

The reference fine-tunes from shipped torch checkpoints
(``RAGraph_edge/utils/parse_args.py:18`` —
``pretrained_weights/GraphPro_Taobao_pretrained.pt`` etc.), loaded with
``torch.load`` and consumed as a ``state_dict`` whose embedding entries
start with ``user_embedding`` / ``item_embedding``
(``RAGraph_edge/finetune_rag.py:80-95``). This module converts such a
file into the numpy table dict our drivers use (same structure that
``BestCheckpointKeeper`` writes), so ``--pre-model-path foo.pt`` can
bootstrap fine-tuning directly from the reference's published weights.

torch is only imported inside the loader — the rest of the framework has
no torch dependency.
"""

from __future__ import annotations

import numpy as np

TABLE_PREFIXES = ("user_embedding", "item_embedding")


def load_torch_state_dict(path: str) -> dict:
    """``torch.load`` a checkpoint to host numpy, CPU-mapped.

    Accepts either a bare ``state_dict`` or a wrapper dict holding one
    under a conventional key (``state_dict`` / ``model_state_dict`` /
    ``model``) — all formats seen in the reference family's save calls.
    """
    import torch

    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        # older torch pickles (e.g. with argparse.Namespace inside)
        obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):           # a full nn.Module was saved
        obj = obj.state_dict()
    for key in ("state_dict", "model_state_dict", "model"):
        if isinstance(obj, dict) and key in obj \
                and isinstance(obj[key], dict):
            obj = obj[key]
            break
    out = {}
    for k, v in obj.items():
        if hasattr(v, "detach"):
            out[k] = v.detach().cpu().numpy()
        elif isinstance(v, np.ndarray):
            out[k] = v
        # non-tensor entries (hyperparams etc.) are dropped
    return out


def tables_from_torch(path: str) -> dict:
    """Embedding-table pytree from a reference ``.pt`` checkpoint.

    Returns ``{"user_embedding": (U, D) f32, "item_embedding": (I, D)
    f32}`` — exactly what ``staged_finetune`` / ``staged_dynamic``
    consume as ``pretrain_tables``. Raises ``KeyError`` if the file has
    no embedding tables (wrong checkpoint kind).
    """
    sd = load_torch_state_dict(path)
    tables = {}
    for prefix in TABLE_PREFIXES:
        # exact key, or the reference's occasional ".weight" suffix when
        # the table is an nn.Embedding rather than a bare Parameter
        for cand in (prefix, prefix + ".weight"):
            if cand in sd:
                tables[prefix] = np.asarray(sd[cand], dtype=np.float32)
                break
        else:
            raise KeyError(
                f"{path}: no '{prefix}' entry (keys: {sorted(sd)[:8]}...)")
    return tables

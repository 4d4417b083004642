"""Fault tolerance of the staged drivers: per-stage checkpoint + resume.

The reference saves per-stage *models* (``RAGraph_edge/finetune_rag.py:
163``, reloaded at ``:63-66`` for the interpolative merge) but the loop
state itself dies with the process — a crash at stage 7 of 8 restarts
from stage 1. ``staged_finetune`` / ``staged_dynamic`` checkpoint the
carried state after every stage (``checkpoint_dir=``) and resume after
the last completed stage (``resume=True``). Because every stage's
randomness derives from ``fold_in(key, stage)`` — never from loop
history — the resumed trajectory must be BIT-EQUAL to an uninterrupted
run; these tests assert exact float equality, not tolerance.
"""

import numpy as np
import jax.random as jr
import pytest

from ragraph_tpu.data.edgelist import load_edge_dataset
from ragraph_tpu.data.synthetic import synthetic_edge_stream
from ragraph_tpu.models.edge import (EdgeGraphArrays, EdgeModelConfig,
                                     GraphPro, Roland, staged_dynamic,
                                     staged_finetune)


def _cfg(**kw):
    base = dict(emb_size=16, num_layers=2, batch_size=128,
                eval_batch_size=64, edge_dropout=0.3, lr=5e-3,
                early_stop_patience=5, retrieve_num=5, retrieve_weight=0.3)
    base.update(kw)
    return EdgeModelConfig(**base)


@pytest.fixture(scope="module")
def setup():
    train, stages = synthetic_edge_stream(seed=0, num_users=48,
                                          num_items=96, num_stages=3,
                                          interactions_per_user=10)
    ds = load_edge_dataset(train, [(u, i) for (u, i, _) in stages[0]])
    pre = GraphPro(_cfg(), EdgeGraphArrays.from_dataset(ds),
                   phase="pretrain")
    pre_params = pre.init_params(jr.key(0))
    tables = {"user_embedding": np.asarray(pre_params["user_embedding"]),
              "item_embedding": np.asarray(pre_params["item_embedding"])}
    return train, stages, tables


def test_staged_finetune_resume_bit_equal(setup, tmp_path):
    train, stages, tables = setup
    kw = dict(cfg_factory=lambda phase: _cfg(use_noise=False),
              key=jr.key(2), num_epochs=3, updt_inter=2,
              logger=lambda *_: None)
    full = staged_finetune(train, stages[0], list(stages), tables, **kw)
    assert len(full.recalls) == 3

    ckpt = str(tmp_path / "staged")
    part = staged_finetune(train, stages[0], list(stages), tables,
                           checkpoint_dir=ckpt, stop_after_stage=1, **kw)
    assert part.recalls == full.recalls[:1]

    resumed = staged_finetune(train, stages[0], list(stages), tables,
                              checkpoint_dir=ckpt, resume=True, **kw)
    # stages 2..3 ran fresh after restoring stage-1 state: identical
    np.testing.assert_array_equal(np.asarray(resumed.recalls,
                                             dtype=np.float64),
                                  np.asarray(full.recalls,
                                             dtype=np.float64))
    np.testing.assert_array_equal(np.asarray(resumed.ndcgs,
                                             dtype=np.float64),
                                  np.asarray(full.ndcgs,
                                             dtype=np.float64))


def test_staged_finetune_resume_updt_inter_window(setup, tmp_path):
    """Interrupt INSIDE the merge window (stage 2 of 3, updt_inter=2):
    stage 3's interpolative merge needs both earlier stage tables out of
    the checkpoint — truncating the stored list to the window must not
    change the result."""
    train, stages, tables = setup
    kw = dict(cfg_factory=lambda phase: _cfg(use_noise=False),
              key=jr.key(2), num_epochs=3, updt_inter=2,
              logger=lambda *_: None)
    full = staged_finetune(train, stages[0], list(stages), tables, **kw)
    ckpt = str(tmp_path / "staged2")
    staged_finetune(train, stages[0], list(stages), tables,
                    checkpoint_dir=ckpt, stop_after_stage=2, **kw)
    resumed = staged_finetune(train, stages[0], list(stages), tables,
                              checkpoint_dir=ckpt, resume=True, **kw)
    np.testing.assert_array_equal(np.asarray(resumed.recalls,
                                             dtype=np.float64),
                                  np.asarray(full.recalls,
                                             dtype=np.float64))


def test_staged_finetune_resume_complete_run_is_noop(setup, tmp_path):
    """Resuming a run whose every stage completed returns the stored
    metrics without training anything."""
    train, stages, tables = setup
    kw = dict(cfg_factory=lambda phase: _cfg(use_noise=False),
              key=jr.key(2), num_epochs=3, updt_inter=2,
              logger=lambda *_: None)
    ckpt = str(tmp_path / "staged3")
    full = staged_finetune(train, stages[0], list(stages), tables,
                           checkpoint_dir=ckpt, **kw)
    calls = []
    resumed = staged_finetune(train, stages[0], list(stages), tables,
                              checkpoint_dir=ckpt, resume=True,
                              cfg_factory=lambda phase: calls.append(phase)
                              or _cfg(use_noise=False),
                              key=jr.key(2), num_epochs=3, updt_inter=2,
                              logger=lambda *_: None)
    assert resumed.recalls == full.recalls
    assert calls == []  # no stage re-entered -> no model ever built


def test_staged_dynamic_resume_bit_equal(setup, tmp_path):
    train, stages, tables = setup
    kw = dict(cfg_factory=lambda phase: _cfg(use_noise=False),
              key=jr.key(3), model_cls=Roland, mode="roland",
              num_epochs=2, logger=lambda *_: None)
    full = staged_dynamic(train, stages[0], list(stages), tables, **kw)
    assert len(full.recalls) == 3

    ckpt = str(tmp_path / "dyn")
    staged_dynamic(train, stages[0], list(stages), tables,
                   checkpoint_dir=ckpt, stop_after_stage=1, **kw)
    resumed = staged_dynamic(train, stages[0], list(stages), tables,
                             checkpoint_dir=ckpt, resume=True, **kw)
    np.testing.assert_array_equal(np.asarray(resumed.recalls,
                                             dtype=np.float64),
                                  np.asarray(full.recalls,
                                             dtype=np.float64))

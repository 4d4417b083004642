"""Marker tests for committed measurement artifacts (VERDICT r3 items
5 and 7): the claims docs/SERVING.md and README quote must match the
JSON they cite. These assert the COMMITTED results; re-run the bench
and re-commit the JSON if a kernel/serving change shifts them.
"""

import json
import os

import pytest

RESULTS = os.path.join(os.path.dirname(__file__), "..", "results")


def _load(name):
    path = os.path.join(RESULTS, name)
    if not os.path.exists(path):
        pytest.skip(f"{name} not generated")
    with open(path) as f:
        return json.load(f)


def test_serving_percentiles_pool_shape():
    """SERVING.md's tail-latency table: >=3 independent sessions pooled,
    every arm carries p50/p99 (benchmarks/serving_percentiles.py)."""
    out = _load("serving_percentiles.json")
    assert out["n_sessions"] >= 3, out["n_sessions"]
    for arm, st in out["arms"].items():
        assert st["n"] >= 3 * out["n_sessions"], (arm, st["n"])
        assert st["min"] <= st["p50"] <= st["p90"] <= st["p99"] \
            <= st["max"], (arm, st)
        assert len(st["per_session_p50"]) == out["n_sessions"]


def test_serving_donated_dispatch_cuts_tail():
    """The SERVING.md claim behind donate_argnums: donated single-request
    dispatch has a no-worse tail than the plain path."""
    out = _load("serving_percentiles.json")
    arms = out["arms"]
    if "B1_dispatch_ms" not in arms or "B1_dispatch_donate_ms" not in arms:
        pytest.skip("dispatch arms not captured")
    assert arms["B1_dispatch_donate_ms"]["p99"] \
        <= arms["B1_dispatch_ms"]["p99"] * 1.05, arms


def test_exact_phases_pipelining_claim():
    """README/SERVING.md: exact bucketed top-k is a *latency* cost, not a
    throughput cost — pipelined independent batches sustain a lower
    ms/batch than the data-dependent chain, and beat approx_max_k
    (benchmarks/bench_exact_phases.py)."""
    out = _load("exact_phases.json")
    lat, tp = out["latency_ms"], out["throughput_ms"]
    assert tp["full_exact"] < lat["full_exact"], out
    # the headline: sustained exact <= approx (ratio < 1)
    assert tp["ratio"] < 1.0, tp
    # latency mode reproduces the historical 1.9-2.4x band
    assert 1.5 <= lat["ratio"] <= 3.0, lat


def test_koubei_dryrun_compile_vs_steady_split():
    """VERDICT r3 item 3: the 135 s 'generate_plain_s' anomaly must be
    recorded as compile time separate from steady-state, and the scale
    eval must assert a planted signal above chance."""
    out = _load("koubei_scale_dryrun.json")
    assert "generate_compile_s" in out and "generate_steady_ms" in out, out
    # steady-state generate is ms-scale; compile (through the tunnel)
    # is minutes-scale — three+ orders apart
    assert out["generate_steady_ms"] / 1e3 < out["generate_compile_s"] / 100
    assert out["selection_dtype"] in ("f32", "bf16")
    assert out["eval_recall_planted"] > 2.0 * out["eval_recall_chance"]

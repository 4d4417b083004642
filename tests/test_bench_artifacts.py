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


def test_readme_bands_match_latest_bench():
    """README's measured-performance table must trace to the newest
    non-degraded driver capture (VERDICT r4 item 3: quoted bands rotted
    against BENCH_r04). The bands live in a BENCH_BANDS comment next to
    the table; every metric present in the newest BENCH_r*.json must
    fall inside its band."""
    import glob
    import re
    root = os.path.join(os.path.dirname(__file__), "..")
    benches = sorted(glob.glob(os.path.join(root, "BENCH_r*.json")))
    if not benches:
        pytest.skip("no driver BENCH captures")
    with open(os.path.join(root, "README.md")) as f:
        readme = f.read()
    m = re.search(r"BENCH_BANDS.*?(\{.*?\})\s*-->", readme, re.DOTALL)
    assert m, "README BENCH_BANDS comment missing"
    bands = json.loads(m.group(1))
    # newest capture that is parsed and not flagged degraded
    latest = None
    for path in reversed(benches):
        with open(path) as f:
            cap = json.load(f)
        parsed = cap.get("parsed") or {}
        if parsed and not parsed.get("degraded", False):
            latest = (os.path.basename(path), parsed)
            break
    if latest is None:
        pytest.skip("no non-degraded BENCH capture")
    name, parsed = latest
    checked = 0
    for metric, (lo, hi) in bands.items():
        if parsed.get(metric) is None:
            continue
        v = parsed[metric]
        assert lo <= v <= hi, (name, metric, v, lo, hi)
        checked += 1
    assert checked >= 5, f"only {checked} metrics checked vs {name}"


def test_exact_phases_corrected_capture():
    """README/SERVING.md: exact bucketed top-k costs ~2-2.7x approx both
    in latency and sustained. The r4 claim that pipelined independent
    batches sustain 0.60x of approx came from an XLA loop-elision
    artifact (loop-invariant throughput body collapsed to one
    evaluation) and is RETRACTED; this pins the corrected capture from
    the elision-proof harness (benchmarks/bench_exact_phases.py) and
    fails if the stale artifact ever returns."""
    out = _load("exact_phases.json")
    lat, tp = out["latency_ms"], out["throughput_ms"]
    # the retracted artifact showed tp.ratio 0.597 — anything sustained
    # below ~1.3x approx at this shape is elision, not pipelining
    assert tp["ratio"] >= 1.3, (
        "sustained exact below 1.3x approx — loop-elision artifact?", tp)
    # latency mode reproduces the historical 1.9-2.4x band (chip-state
    # variance widens it)
    assert 1.5 <= lat["ratio"] <= 3.0, lat
    # the 2x2 reconciliation arms (r4 weak #2) must be present and
    # AGREE: same-session chain-structure and body-form variations stay
    # within 15% (measured <1% in the r5 capture) — fori_loop iterations
    # do not pipeline on TPU, sustained == latency for this op
    arms = [lat["full_exact"], lat["full_exact_add_body"],
            tp["full_exact"], tp["full_exact_norm_body"]]
    assert max(arms) <= 1.15 * min(arms), arms


def test_10m_index_tiers():
    """README's 10M-row rows (r4 verdict item 8: the serving-grade
    int8+rescore tier needed a number at scale). The rescore tier must
    recover near-bf16 recall while beating the bf16 path's wall-clock
    (benchmarks/bench_10m_index.py)."""
    out = _load("bench_10m_index.json")
    assert out["R"] == 10_000_000
    assert out["brute_recall_vs_exact"] >= 0.99, out
    assert out["int8_recall_vs_bf16"] >= 0.80, out
    assert out["int8_rescore_recall_vs_bf16"] >= 0.95, out
    assert out["int8_rescore_ms"] <= out["brute_ms"], out


def test_koubei_staged_scale_v2():
    """VERDICT r4 item 5: the staged-scale capture must carry REAL HBM
    accounting (XLA compile-time memory analysis — device.memory_stats()
    reports zeros through the tunnel) and a LIVE patience-10 early stop
    at koubei scale (stage 4 runs under a 60-epoch cap and must end on
    the early-stop path, not the cap)."""
    out = _load("koubei_scale_staged.json")
    assert out["peak_hbm_gib"] > 0.5, out["peak_hbm_gib"]
    assert out["memory_analyses"], "memory_analyses empty"
    assert "early stop at epoch" in out["early_stop_line"], out
    # the early stop fired strictly under the cap
    stopped_at = int(out["early_stop_line"].split("epoch")[1].split(";")[0])
    assert stopped_at < out["final_stage_epoch_cap"], out
    assert len(out["recalls"]) == out["n_stages"] == 4
    for r in out["recalls"]:
        assert r > 0.5 * out["recall_ceiling"], (r, out["recall_ceiling"])


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

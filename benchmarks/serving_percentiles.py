"""Aggregate per-session serving samples into cross-session percentiles.

VERDICT r3 #7: single-session means hide the documented chip-state
variance (the exact/approx ratio swings 1.9-2.4x across sessions), so
``bench_serving.py`` now dumps its raw per-rep samples to
``results/serving_sessions/session_<ts>.json`` and this script pools
>=3 sessions into p50/p90/p99 tables for docs/SERVING.md.

Each session's samples are already per-rep bests-of-iters (the serving
quantity of interest is the achievable per-request latency, not host
jitter); pooling across sessions captures the chip/tunnel state
distribution a deployment actually sees.

Usage: python benchmarks/serving_percentiles.py   (pure host-side, no TPU)
"""

import glob
import json
import os

import numpy as np

SESS_DIR = "results/serving_sessions"

LABELS = {
    "refresh_ms": "embedding refresh (128k users/items, 2M edges, 3 layers)",
    "B1_ms": "recommend_from B=1 (in-chain)",
    "B256_ms": "recommend_from B=256",
    "B4096_ms": "recommend_from B=4096",
    "B4096_fused_ms": "recommend_from B=4096 fused history-filter",
    "B1_dispatch_ms": "dispatch-mode B=1 per request",
    "B1_dispatch_donate_ms": "dispatch-mode B=1 per request (donated)",
    "node_ms": "node-task training-free forward (2048 nodes, 262k library)",
}


def main():
    files = sorted(glob.glob(os.path.join(SESS_DIR, "session_*.json")))
    if not files:
        raise SystemExit(f"no session files in {SESS_DIR} — run "
                         "benchmarks/bench_serving.py first")
    sessions = [json.load(open(f)) for f in files]
    print(f"{len(sessions)} sessions pooled "
          f"({', '.join(os.path.basename(f) for f in files)})\n")

    out = {"n_sessions": len(sessions), "files": files, "arms": {}}
    rows = []
    for key, label in LABELS.items():
        pooled = np.concatenate(
            [np.asarray(s["arms"][key], dtype=np.float64)
             for s in sessions if key in s.get("arms", {})])
        if pooled.size == 0:
            continue
        p50, p90, p99 = np.percentile(pooled, [50, 90, 99])
        stats = {"n": int(pooled.size), "min": float(pooled.min()),
                 "p50": float(p50), "p90": float(p90), "p99": float(p99),
                 "max": float(pooled.max()),
                 "per_session_p50": [
                     float(np.median(s["arms"][key])) for s in sessions
                     if key in s.get("arms", {})]}
        out["arms"][key] = stats
        rows.append((label, stats))

    w = max(len(r[0]) for r in rows)
    print(f"{'arm':<{w}}  {'n':>4} {'min':>8} {'p50':>8} {'p90':>8} "
          f"{'p99':>8} {'max':>8}   per-session p50s (ms)")
    for label, s in rows:
        ps = "/".join(f"{x:.3f}" for x in s["per_session_p50"])
        print(f"{label:<{w}}  {s['n']:>4} {s['min']:>8.3f} {s['p50']:>8.3f} "
              f"{s['p90']:>8.3f} {s['p99']:>8.3f} {s['max']:>8.3f}   {ps}")

    with open("results/serving_percentiles.json", "w") as f:
        json.dump(out, f, indent=2)
    print("\nwritten to results/serving_percentiles.json")


if __name__ == "__main__":
    main()

"""Pool serving-latency session files into the p50/p99 table (VERDICT r3 #7).

``benchmarks/bench_serving.py`` dumps raw per-repetition samples to
results/serving_sessions/session_<ts>.json. This pools every session
file and prints per-arm percentiles over the pooled samples, plus the
per-session p50 spread (the cross-session chip-state swing SERVING.md
warns about). Percentiles are over chain-level samples — see the
methodology note at the top of bench_serving.py.

Usage: python benchmarks/serving_percentiles.py [--markdown]
"""

import glob
import json
import sys

import numpy as np

ARMS = [
    ("refresh_ms", "edge embedding refresh (2M edges, 3 layers)"),
    ("B1_ms", "recommend_from B=1"),
    ("B256_ms", "recommend_from B=256"),
    ("B4096_ms", "recommend_from B=4096 (scatter mask)"),
    ("B4096_fused_ms", "recommend_from B=4096 (hist_pad=64)"),
    ("B1_dispatch_ms", "dispatch-mode B=1 (plain)"),
    ("B1_dispatch_donate_ms", "dispatch-mode B=1 (donated)"),
    ("node_ms", "node-task inference (2048 nodes)"),
]


def main():
    files = sorted(glob.glob("results/serving_sessions/session_*.json"))
    if not files:
        print("no session files under results/serving_sessions/ — run "
              "benchmarks/bench_serving.py first", file=sys.stderr)
        sys.exit(1)
    sessions = []
    for path in files:
        with open(path) as f:
            sessions.append(json.load(f))
    print(f"{len(sessions)} sessions pooled "
          f"({sum(s['reps'] for s in sessions)} samples/arm)")

    markdown = "--markdown" in sys.argv
    if markdown:
        print("| arm | p50 | p99 | min | session-p50 spread |")
        print("|---|---|---|---|---|")
    for key, label in ARMS:
        pooled = np.concatenate(
            [np.asarray(s["arms"][key], dtype=float) for s in sessions
             if key in s["arms"]])
        per_session_p50 = [float(np.percentile(s["arms"][key], 50))
                           for s in sessions if key in s["arms"]]
        p50 = float(np.percentile(pooled, 50))
        p99 = float(np.percentile(pooled, 99))
        lo, hi = min(per_session_p50), max(per_session_p50)
        if markdown:
            print(f"| {label} | {p50:.3f} ms | {p99:.3f} ms | "
                  f"{pooled.min():.3f} ms | {lo:.3f}-{hi:.3f} ms |")
        else:
            print(f"{label:<48} p50 {p50:8.3f}  p99 {p99:8.3f}  "
                  f"min {pooled.min():8.3f}  session-p50 {lo:.3f}-{hi:.3f}")


if __name__ == "__main__":
    main()

#!/bin/bash
# Round-4 queue 2: runs after queue 1 (watcher waits for ALL DONE).
# TPU jobs first, then the CPU-heavy reruns (1 CPU on this host — keep
# everything strictly serial).
cd /root/repo
mkdir -p logs results
Q() {
  local t="$1" log="$2"; shift 2
  echo "[queue2] $(date -u +%H:%M:%S) START $log" >> logs/r4_queue2.log
  timeout "$t" "$@" > "logs/$log" 2>&1
  echo "[queue2] $(date -u +%H:%M:%S) DONE rc=$? $log" >> logs/r4_queue2.log
}
echo "[queue2] $(date -u +%H:%M:%S) queue2 pid $$" > logs/r4_queue2.log

Q 3600 r4_exact_phases_v2.log python benchmarks/bench_exact_phases.py
Q 3600 r4_bench_smoke.log     python bench.py
Q 1800 r4_pytest.log          python -m pytest tests/ -q
Q 7200 r4_ediff.log           python experiments/reference_e2e_differential_edge.py
Q 5400 r4_sdiff.log           python experiments/reference_e2e_differential.py
echo "[queue2] $(date -u +%H:%M:%S) ALL DONE" >> logs/r4_queue2.log

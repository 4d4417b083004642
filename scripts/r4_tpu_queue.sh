#!/bin/bash
# Round-4 TPU job queue. STRICTLY SERIAL (one axon process at a time —
# see CLAUDE.md). Chained with `;` so one timeout doesn't cancel the
# rest. Generous timeouts: mid-run tunnel stalls of 10-15 min happen
# and recover (round-3 learnings).
cd /root/repo
mkdir -p logs results
Q() {  # Q <timeout_s> <logfile> <cmd...>
  local t="$1" log="$2"; shift 2
  echo "[queue] $(date -u +%H:%M:%S) START $log" >> logs/r4_queue.log
  timeout "$t" "$@" > "logs/$log" 2>&1
  echo "[queue] $(date -u +%H:%M:%S) DONE rc=$? $log" >> logs/r4_queue.log
}
echo "[queue] $(date -u +%H:%M:%S) queue pid $$" > logs/r4_queue.log

Q 4500 r4_staged.log        python experiments/koubei_scale_staged.py
Q 3600 r4_dryrun_f32.log    python experiments/koubei_scale_dryrun.py 1.0 256 f32
Q 3600 r4_dryrun_bf16.log   python experiments/koubei_scale_dryrun.py 1.0 256 bf16
Q 3600 r4_exact_phases.log  python benchmarks/bench_exact_phases.py
Q 2400 r4_serving_s2.log    python benchmarks/bench_serving.py
Q 2400 r4_serving_s3.log    python benchmarks/bench_serving.py
Q 3600 r4_amzn_frozen_s7.log python experiments/amazon_real.py sweep-RAGraph-svdfrozen 7 ""
Q 3600 r4_amzn_frozen_s8.log python experiments/amazon_real.py sweep-RAGraph-svdfrozen 8 "-s8"
Q 3600 r4_amzn_frozen_s9.log python experiments/amazon_real.py sweep-RAGraph-svdfrozen 9 "-s9"
echo "[queue] $(date -u +%H:%M:%S) ALL DONE" >> logs/r4_queue.log

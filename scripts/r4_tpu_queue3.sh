#!/bin/bash
# Round-4 queue 3: waits for queue 2's ALL DONE, then runs strictly
# serial TPU jobs: regenerate the amazon pretrain checkpoint (the
# svdfrozen seeds 7-9 crashed on its absence), rerun those seeds,
# validate the fixed bench.py exact-throughput arm, and capture the
# loop-elision forensics.
cd /root/repo
mkdir -p logs results
echo "[queue3] $(date -u +%H:%M:%S) queue3 pid $$ waiting for queue2" > logs/r4_queue3.log
while ! grep -q "ALL DONE" logs/r4_queue2.log 2>/dev/null; do sleep 60; done
Q() {
  local t="$1" log="$2"; shift 2
  echo "[queue3] $(date -u +%H:%M:%S) START $log" >> logs/r4_queue3.log
  timeout "$t" "$@" > "logs/$log" 2>&1
  echo "[queue3] $(date -u +%H:%M:%S) DONE rc=$? $log" >> logs/r4_queue3.log
}
Q 5400 r4_amzn_pretrain.log  python experiments/amazon_real.py pretrain
Q 3600 r4_amzn_frozen_s7b.log python experiments/amazon_real.py sweep-RAGraph-svdfrozen 7
Q 3600 r4_amzn_frozen_s8b.log python experiments/amazon_real.py sweep-RAGraph-svdfrozen 8
Q 3600 r4_amzn_frozen_s9b.log python experiments/amazon_real.py sweep-RAGraph-svdfrozen 9
Q 3600 r4_bench_smoke2.log    python bench.py
Q 1800 r4_elision.log         python benchmarks/bench_loop_elision.py
echo "[queue3] $(date -u +%H:%M:%S) ALL DONE" >> logs/r4_queue3.log

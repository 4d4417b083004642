#!/bin/bash
# Round-4 queue 6: resume after the host restart killed queues 3-5
# mid-flight (seed 8 frozen arm died at stage ~7). Reruns everything
# that had not completed, strictly serial (one TPU process at a time;
# CPU pytest serialized too per CLAUDE.md).
cd /root/repo
mkdir -p logs results
echo "[queue6] $(date -u +%H:%M:%S) queue6 pid $$ starting" > logs/r4_queue6.log
Q() {
  local t="$1" log="$2"; shift 2
  echo "[queue6] $(date -u +%H:%M:%S) START $log" >> logs/r4_queue6.log
  timeout "$t" "$@" > "logs/$log" 2>&1
  echo "[queue6] $(date -u +%H:%M:%S) DONE rc=$? $log" >> logs/r4_queue6.log
}
Q 3600 r4_amzn_frozen_s8c.log python experiments/amazon_real.py sweep-RAGraph-svdfrozen 8
Q 3600 r4_amzn_frozen_s9c.log python experiments/amazon_real.py sweep-RAGraph-svdfrozen 9
Q 3600 r4_bench_smoke2.log    python bench.py
Q 1800 r4_elision.log         python benchmarks/bench_loop_elision.py
Q 1800 r4_graft_dryrun.log    python __graft_entry__.py
rm -rf /tmp/koubei_staged_ckpt
Q 1000 r4_staged_killed.log  python experiments/koubei_scale_staged.py
# the killed TPU process can leave the tunnel wedged for ~3 min; the
# resumed run's first backend init absorbs that (budget is generous)
Q 4500 r4_staged_resumed.log env RESUME=1 python experiments/koubei_scale_staged.py
Q 2400 r4_pytest_final.log   python -m pytest tests/ -q
echo "[queue6] $(date -u +%H:%M:%S) ALL DONE" >> logs/r4_queue6.log

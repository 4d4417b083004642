#!/bin/bash
# Round-4 queue 5: waits for queue 4's ALL DONE, then
#  (a) kill-and-resume proof of the staged-loop fault tolerance at
#      koubei published scale: run the staged experiment, kill it
#      mid-stage-2 (timeout 1000 s ~= pretrain + stage 1 + part of
#      stage 2), then rerun with RESUME=1 — the rerun must log
#      "resuming staged loop after completed stage 1" and finish the
#      protocol (results JSON written by the resumed run);
#  (b) the full CPU test suite (serialized with the TPU jobs per
#      CLAUDE.md: host contention blows remote-compile timeouts).
cd /root/repo
mkdir -p logs results
echo "[queue5] $(date -u +%H:%M:%S) queue5 pid $$ waiting for queue4" > logs/r4_queue5.log
while ! grep -q "ALL DONE" logs/r4_queue4.log 2>/dev/null; do sleep 60; done
Q() {
  local t="$1" log="$2"; shift 2
  echo "[queue5] $(date -u +%H:%M:%S) START $log" >> logs/r4_queue5.log
  timeout "$t" "$@" > "logs/$log" 2>&1
  echo "[queue5] $(date -u +%H:%M:%S) DONE rc=$? $log" >> logs/r4_queue5.log
}
rm -rf /tmp/koubei_staged_ckpt
Q 1000 r4_staged_killed.log  python experiments/koubei_scale_staged.py
# the killed TPU process can leave the tunnel wedged for ~3 min; the
# resumed run's first backend init absorbs that (budget is generous)
Q 4500 r4_staged_resumed.log env RESUME=1 python experiments/koubei_scale_staged.py
Q 2400 r4_pytest_final.log   python -m pytest tests/ -q
echo "[queue5] $(date -u +%H:%M:%S) ALL DONE" >> logs/r4_queue5.log

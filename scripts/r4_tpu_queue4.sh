#!/bin/bash
# Round-4 queue 4: waits for queue 3's ALL DONE, then the remaining
# CPU-side validations (strictly serial with the TPU jobs per
# CLAUDE.md: host contention blows remote-compile timeouts).
cd /root/repo
mkdir -p logs results
echo "[queue4] $(date -u +%H:%M:%S) queue4 pid $$ waiting for queue3" > logs/r4_queue4.log
while ! grep -q "ALL DONE" logs/r4_queue3.log 2>/dev/null; do sleep 60; done
Q() {
  local t="$1" log="$2"; shift 2
  echo "[queue4] $(date -u +%H:%M:%S) START $log" >> logs/r4_queue4.log
  timeout "$t" "$@" > "logs/$log" 2>&1
  echo "[queue4] $(date -u +%H:%M:%S) DONE rc=$? $log" >> logs/r4_queue4.log
}
Q 1800 r4_graft_dryrun.log python __graft_entry__.py
echo "[queue4] $(date -u +%H:%M:%S) ALL DONE" >> logs/r4_queue4.log

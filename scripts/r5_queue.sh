#!/bin/bash
# Round-5 TPU work queue: outstanding E_L1 ladder rungs (fresh process
# per factor group -- the in-process factor-4 rung OOM'd on TPU HBM),
# then refresh of the two no-uptake artifact rows that predate current
# solver code (micro_depth_wide / micro_square).
set -u
cd /root/repo
LOG=/tmp/ladder_queue.log
run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  timeout 3000 "$@" >> "$LOG" 2>&1
  echo "=== rc=$? $(date +%H:%M:%S)" >> "$LOG"
}

# 1) finish w0.7/d0.7 (factors 1,2 committed; needs 4 (+8 if no certificate))
run python scripts/el1_convergence.py --w 0.7 --d 0.7 --factors 4 --extend
# 2) full families for the last two outstanding certificates
for f in 1 2 4; do
  run python scripts/el1_convergence.py --w 0.8 --d 0.6 --factors $f --extend
done
for f in 1 2 4; do
  run python scripts/el1_convergence.py --w 0.4 --d 2.0 --factors $f --extend
done
echo "=== LADDERS DONE $(date +%H:%M:%S)" >> "$LOG"

# 3) refresh stale no-uptake rows (also yields fresh warm s/geometry numbers)
run python scripts/run_no_uptake_extra.py micro_depth_wide micro_square
echo "=== QUEUE DONE $(date +%H:%M:%S)" >> "$LOG"

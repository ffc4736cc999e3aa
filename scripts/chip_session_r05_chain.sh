#!/bin/bash
# Chains the round-5 chip work: wait for part 1 (PID file) to drain, then
# the benzene retry (with the pretrain-gradient chunk fix that part 1's
# first attempt was missing), then part 2 (traces/probes/gates).
set -x
cd /root/repo
SESSION=runs/logs/r05_session.log

P1=$(cat /tmp/r05_part1.pid 2>/dev/null)
while [ -n "$P1" ] && kill -0 "$P1" 2>/dev/null; do sleep 60; done
echo "=== part 1 drained $(date); starting benzene retry ===" >> "$SESSION"

t0=$SECONDS
timeout 12600 python scripts/accuracy_runs.py --only benzene_excited \
  > runs/logs/r05_benzene2.log 2>&1
echo "stage benzene2: rc=$? elapsed=$((SECONDS - t0))s" | tee -a "$SESSION"
touch /tmp/r05_benzene2.done

bash scripts/chip_session_r05b.sh

#!/bin/bash
# Round-5 chip session, part 4 (fresh container 07:15 UTC: runs/ from parts
# 1-3 was lost with the container, so the benzene checkpoints are gone and
# the run restarts from scratch — with every fix the earlier attempts
# bought: chunk-64 gradient/pretrain pullbacks, the 300-step equilibration
# cap, and the host-side SCF target precomputed off the critical path).
#
# Queue (hard per-stage timeouts; a failure never starves the next stage):
#   0. wait for the host-side benzene SCF/CASCI precompute to drain
#   1. benzene 2-state excited — progression config 5, the 4-round ask
#   2. benzene eval recovery (only if training completed but eval didn't)
#   3. LiH 2-state excited — hardware row for the multi-state path
#      (clock-guarded: leaves room for the bench-cache regen)
# The bench-cache regeneration runs manually after the FINAL source commit.
set -x
cd /root/repo
mkdir -p docs/evidence runs/logs
SESSION=runs/logs/r05_session.log
stage() { # stage <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  local t0=$SECONDS
  timeout "$tmo" "$@" > "runs/logs/r05_${name}.log" 2>&1
  local rc=$?
  echo "stage ${name}: rc=${rc} elapsed=$((SECONDS - t0))s" | tee -a "$SESSION"
  touch "/tmp/r05_${name}.done"
}

echo "=== r05 part 4 start $(date) ===" >> "$SESSION"

# 0: drain the SCF precompute (pure host work started alongside this script)
SCF=$(cat /tmp/scf_benzene.pid 2>/dev/null)
while [ -n "$SCF" ] && kill -0 "$SCF" 2>/dev/null; do sleep 20; done
echo "scf precompute drained $(date)" >> "$SESSION"

# 1: benzene attempt 5 (fresh run, chunk 64, eq cap 300)
stage benzene5 12000 python scripts/accuracy_runs.py --only benzene_excited

# 2: eval recovery — only when training finished but the stage timeout
#    killed the evaluation (accuracy_runs skips completed trainings)
if grep -q 'training has been completed' runs/accuracy/benzene_excited/deepqmc.log 2>/dev/null \
   && ! grep -q 'evaluation has been completed' runs/accuracy/benzene_excited_eval/deepqmc.log 2>/dev/null; then
  stage benzene5_eval 4200 python scripts/accuracy_runs.py --only benzene_excited
fi

# 3: LiH 2-state — only if it can drain before the bench-cache slot
#    (45 min budget; cutoff 11:05 UTC = 1787310300)
if [ "$(date +%s)" -lt 1787310300 ]; then
  stage lih_excited 2700 python scripts/accuracy_runs.py --only lih_excited
else
  echo "stage lih_excited: SKIPPED (clock)" | tee -a "$SESSION"
fi

echo "=== r05 part 4 queue done $(date) ===" >> "$SESSION"

#!/bin/bash
# Round-5 chip session, part 5: benzene retry after the worker crash.
#
# Attempt 5 (chunk-64 fused block, Pallas kernels) died with "TPU worker
# process crashed or restarted" on the FIRST fused-block fetch — the same
# failure class as round-4's unchunked ScO probe.  Attempt 6 changes the
# largest failure-mode class at once: DEEPQMC_TPU_NO_PALLAS=1 drops every
# Mosaic kernel (fl_attention / fl_slogdet backward at 42-electron shapes
# have never executed on hardware) in favor of the pure-XLA fwdlap path,
# and restarts from attempt 5's chkpt-0 (pretrained params, equilibrated
# walkers — skips ~55 min of pretrain + equilibration) with a 300-step
# budget sized to the remaining round window.
set -x
cd /root/repo
mkdir -p runs/logs
SESSION=runs/logs/r05_session.log
stage() { # stage <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  local t0=$SECONDS
  timeout "$tmo" "$@" > "runs/logs/r05_${name}.log" 2>&1
  local rc=$?
  echo "stage ${name}: rc=${rc} elapsed=$((SECONDS - t0))s" | tee -a "$SESSION"
  touch "/tmp/r05_${name}.done"
}

# wait for part 4 (lih_excited) to drain
while [ ! -f /tmp/r05_lih_excited.done ]; do sleep 30; done

echo "=== r05 part 5 start $(date) ===" >> "$SESSION"

stage benzene6 9000 env DEEPQMC_TPU_NO_PALLAS=1 \
  python scripts/accuracy_runs.py --only benzene_excited \
  --resume-to 300 --eval-steps 80

echo "=== r05 part 5 queue done $(date) ===" >> "$SESSION"

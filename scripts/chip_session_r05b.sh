#!/bin/bash
# Round-5 chip session, part 2: trace/attribution captures, the ScO
# fused-block crash probe, and the samp_bf16 convergence gate.
# Dispatched after part 1 (chip_session_r05.sh) drains.  Same hard-slot
# discipline: per-stage timeout, failures never starve later stages.
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

echo "=== r05 part 2 start $(date) ===" >> "$SESSION"

# E0: benzene eval recovery — if the benzene TRAINING completed but the
# stage timeout killed the evaluation, rerun only the eval (accuracy_runs
# skips completed trainings via the done-log check).  Guard hard against
# retraining: only fire when the training log says completed AND no eval
# result exists yet.
if grep -q 'training has been completed' runs/accuracy/benzene_excited/deepqmc.log 2>/dev/null \
   && ! grep -q 'evaluation has been completed' runs/accuracy/benzene_excited_eval/deepqmc.log 2>/dev/null; then
  stage benzene_eval_recovery 5400 python scripts/accuracy_runs.py --only benzene_excited
fi

# E: component attribution INCLUDING the optimizer half, at headline shapes
#    (marginal-scan timing; the committed table VERDICT r3/r4 ask for)
stage attribution 3600 python scripts/profile_step_marginal.py \
  --walkers 2048 --mol H2O --ansatz psiformer
cp runs/logs/r05_attribution.log docs/evidence/step_attribution_r05.jsonl || true

# E2: sampling sweep at single-pass bf16 — the speed half of the samp_bf16
#     lever (the convergence half is stage H)
stage attribution_sampbf16 1800 env DEEPQMC_TPU_SAMPLING_PRECISION=default \
  python scripts/profile_step_marginal.py \
  --walkers 2048 --mol H2O --ansatz psiformer --only sample,fwd

# F: xplane trace of the FULL fused training block (fit.py captures block 1)
stage trace_capture 3600 env DEEPQMC_TPU_PROFILE_DIR=/tmp/r05trace \
  python bench.py
stage trace_parse 600 python scripts/trace_eloc.py --parse-only \
  --tracedir /tmp/r05trace --top 60
cp runs/logs/r05_trace_parse.log docs/evidence/trace_step_r05.txt || true

# G (dropped 03:00 session call): the unchunked ScO fused-block crash probe
#    needs a fresh 30-50 min XLA compile of its own program class; with the
#    r05 chip budget consumed by the benzene equilibration/compile, the
#    accuracy stages outrank it.  The round-5 wedge evidence (two worker
#    hangs after client kills, healthy runs before/after at identical
#    shapes) is recorded in PERF.md as the infra-class diagnosis.

# H: samp_bf16 convergence gate (LiH matched budget)
stage ab_sampbf16 6000 python scripts/ab_lih_convergence.py --variants samp_bf16

echo "=== r05 part 2 queue done $(date) ===" >> "$SESSION"

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

# G: ScO fused-block crash probe — the round-4 worker crash reproduced (or
#    not) WITHOUT the eloc walker chunk, at the production fused-block path
#    (random init, pretrain skipped: only the program shape matters)
stage sco_probe 5400 python -m deepqmc_tpu task=train_psiformer \
  hamil/mol=ScO +hamil.ecp_type=ccECP task.electron_batch_size=1024 \
  task.steps=10 task.pretrain_steps=null +task.max_eq_steps=2 \
  +task.fit_block_size=5 --workdir=runs/sco_probe_r05

# H: samp_bf16 convergence gate (LiH matched budget)
stage ab_sampbf16 6000 python scripts/ab_lih_convergence.py --variants samp_bf16

echo "=== r05 part 2 queue done $(date) ===" >> "$SESSION"

#!/bin/bash
# Round-5 chip session, part 1: strictly serial queue on the single v5e
# with HARD per-stage timeouts (VERDICT r4 item 10).  Order per VERDICT:
# the benzene starvation first (behind its cheap LiH-2-state de-risk),
# then the 3x-asked reference-semantics baseline control, then the LiH
# seed-spread run.  Part 2 (trace capture, H2O resume, ScO dissociation,
# bench-cache regen) is dispatched separately once part 1 drains.
#
# Every stage is independent: a timeout or failure in one never starves
# the next.  Stage logs land in runs/logs/r05_*.log, and a one-line
# status per stage is appended to runs/logs/r05_session.log.
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

echo "=== r05 part 1 start $(date) ===" >> "$SESSION"

# A: LiH 2-state — minutes-scale hardware de-risk of the multi-state
#    sampler + overlap gradient + chunked pullback before benzene
stage lih_excited 2700 python scripts/accuracy_runs.py --only lih_excited

# B: benzene 2-state excited — the 4-round starvation; gradient-path OOM
#    now bounded by DEEPQMC_TPU_GRAD_WALKER_CHUNK (config env)
stage benzene 12600 python scripts/accuracy_runs.py --only benzene_excited

# C: TRUE reference-semantics baseline control (3rd time of asking)
stage ab_baseline 6000 python scripts/ab_lih_convergence.py --variants baseline

# D: second seed of the production stack -> LiH seed-spread error bar
stage ab_seed1 6000 python scripts/ab_lih_convergence.py --variants r4_all --seed 1

echo "=== r05 part 1 queue done $(date) ===" >> "$SESSION"

#!/bin/bash
# Round-5 chip session, part 3 (FINAL priority queue, rewritten 03:55 after
# benzene attempt 3's compile-time OOM at chunk 128):
#
#   1. benzene attempt 4 — task=restart from attempt 3's chkpt-0.pt (params
#      are pretrained, walkers equilibrated: skips the 25-min pretrain and
#      the 75-min equilibration) at walker chunk 64 (fits with ~7 GB margin)
#   2. LiH seed-1 at the matched 1000-step budget (seed-spread error bar)
#   3. ScO dissociation atoms (clock-guarded: only if reached early enough)
#
# The H2O continuation is explicitly DROPPED this round: the single-chip
# budget went to benzene per VERDICT r4's own priority order (item 1 over
# item 5); docs/ACCURACY.md records this.  The bench-cache regeneration is
# driven manually after the final source commit (scripts/make_bench_cache.sh).
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

echo "=== r05 part 3 start $(date) ===" >> "$SESSION"

# 1: benzene attempt 4 — restart from the pretrained+equilibrated checkpoint
stage benzene4 14400 python scripts/accuracy_runs.py \
  --only benzene_excited --resume-to 400

# 2: ScO dissociation atoms — config 4's falsifiable accuracy axis
#    (skip if past 08:00 UTC; leaves seed1m + bench-cache room)
if [ "$(date +%s)" -lt 1787299200 ]; then
  stage sco_dissoc 7200 python scripts/sco_dissociation.py \
    --steps 1500 --eval-steps 200
else
  echo "stage sco_dissoc: SKIPPED (clock)" | tee -a "$SESSION"
fi

# 3: seed spread at matched budget (skip if past 08:45 UTC)
if [ "$(date +%s)" -lt 1787301900 ]; then
  stage ab_seed1m 4500 python scripts/ab_lih_convergence.py \
    --variants r4_all --seed 1 --steps 1000
else
  echo "stage ab_seed1m: SKIPPED (clock)" | tee -a "$SESSION"
fi

echo "=== r05 part 3 queue done $(date) ===" >> "$SESSION"

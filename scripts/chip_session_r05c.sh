#!/bin/bash
# Round-5 chip session, part 3: the H2O headline run (fresh — the round-4
# 25k checkpoint was never committed, so there is nothing to resume; this
# run doubles as the pretrain-quality discriminator VERDICT r4 item 5.ii
# asked for: 10k lamb pretrain vs the 1k of the +2.8 mHa row), then the
# ScO dissociation energy, then the LiH 2-state de-risk retry.
# The bench-cache regeneration is NOT here — it must be the last chip use
# of the round, after the final source commit (scripts/make_bench_cache.sh).
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

H2O_STEPS=${H2O_STEPS:-20000}
H2O_PRETRAIN=${H2O_PRETRAIN:-10000}
H2O_TIMEOUT=${H2O_TIMEOUT:-13500}

echo "=== r05 part 3 start $(date) (h2o ${H2O_STEPS}+${H2O_PRETRAIN}pt) ===" >> "$SESSION"

# I: H2O headline, fresh, long pretrain (discriminator for the +2.8 mHa gap)
stage h2o_train "$H2O_TIMEOUT" python -m deepqmc_tpu task=train_psiformer \
  hamil/mol=H2O task.electron_batch_size=2048 "task.steps=${H2O_STEPS}" \
  "task.pretrain_steps=${H2O_PRETRAIN}" +task.fit_block_size=10 \
  --workdir=runs/accuracy/h2o_r05
stage h2o_eval 2700 python -m deepqmc_tpu task=evaluate \
  task.restdir=runs/accuracy/h2o_r05/training +task.steps=500 \
  +task.fit_block_size=10 --workdir=runs/accuracy/h2o_r05_eval

# J: ScO dissociation energy (atoms at the same tables; offsets cancel)
stage sco_dissoc 9000 python scripts/sco_dissociation.py \
  --steps 2000 --eval-steps 300

# K: LiH 2-state de-risk retry (CAS fixed to the minimal basis)
stage lih_excited2 2700 python scripts/accuracy_runs.py --only lih_excited

echo "=== r05 part 3 queue done $(date) ===" >> "$SESSION"

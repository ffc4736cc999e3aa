#!/bin/bash
# Round-3 chip session (revised): runs back-to-back after the H2O resume
# training (PID in /tmp/h2o.pid) exits.  Serialized on the single v5e —
# NOTHING else may touch the chip while a stage runs.
#
# Ordered by VERDICT r2 priority, budgets trimmed to the remaining round
# time (~3.5 h at staging):
#   Stage 0: H2O eval, 500 steps from the 25k-step resume checkpoint
#   Stage A: eloc kernel sweep (bf16-jac x walker-block levers)
#   Stage B: LiH convergence A/B — gate pair FIRST (jac_bf16 vs
#            inv5_samphigh differ only in jac dtype), then the
#            inv-period/sampling-precision decomposition pair
#   Stage C: ScO (progression config 4)
#   Stage D: benzene 2-state excited (progression config 5, token budget)
# Default promotion + bench sanity happen interactively between stages.
set -x
cd /root/repo
mkdir -p docs/evidence

echo "=== stage 0: wait for H2O training, then eval ==="
while kill -0 "$(cat /tmp/h2o.pid)" 2>/dev/null; do sleep 30; done
sleep 10
timeout 2400 python -m deepqmc_tpu task=evaluate \
  task.restdir=runs/accuracy/h2o_resume25000c/training \
  +task.steps=500 +task.fit_block_size=10 \
  --workdir=runs/accuracy/h2o_resume25000c_eval 2>&1 | tail -5
python scripts/record_accuracy_row.py --config h2o \
  --eval-workdir runs/accuracy/h2o_resume25000c_eval \
  --trained-steps 25000 --train-seconds 27080
touch /tmp/stage0.done

echo "=== stage A: eloc sweep ==="
timeout 4200 python scripts/ab_eloc.py \
  --variants default,jac_bf16,jac_bf16_w4,w4,jac_bf16_w8 \
  | tee docs/evidence/ab_eloc_r03_sweep.jsonl
touch /tmp/stageA.done

echo "=== stage B: LiH A/B (gate pair first) ==="
timeout 7200 python scripts/ab_lih_convergence.py --steps 1000 \
  --variants jac_bf16,inv5_samphigh,baseline,inv5 2>&1 | tail -24
touch /tmp/stageB.done

echo "=== chip session phase 1 done ==="

#!/bin/bash
# Round-3 chip session: runs back-to-back once the H2O resume finishes.
# Stage A: eloc kernel sweep — walker blocks for the loop head (never
#          measured in round 2) x the bf16 jac storage channel
# Stage B: ScO (progression config 4)
# Stage C: LiH convergence A/B (VERDICT r2 item 5 + the bf16 gate)
# Benzene (config 5) and the headline bench run are launched separately
# once the sweep winner is promoted and step time is known.
set -x
cd /root/repo
mkdir -p docs/evidence

echo "=== stage A: eloc sweep ==="
timeout 4800 python scripts/ab_eloc.py \
  --variants default,w4,w8,jac_bf16,jac_bf16_w4,jac_bf16_w8 \
  | tee docs/evidence/ab_eloc_r03_sweep.jsonl

echo "=== stage B: ScO config 4 ==="
timeout 7200 python scripts/accuracy_runs.py --only sco 2>&1 | tail -40

echo "=== stage C: LiH A/B ==="
timeout 14400 python scripts/ab_lih_convergence.py 2>&1 | tail -20

echo "=== chip session done ==="

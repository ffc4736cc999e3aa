#!/bin/bash
# Round-3 chip session: runs back-to-back once the H2O resume finishes.
# Serialized on the single v5e — NOTHING else may touch the chip while a
# stage runs (a concurrent compile wedged the tunnel once this round).
#
# Stage 0: H2O eval (500 steps from the final resume checkpoint)  [driven
#          manually — needs the finished checkpoint path]
# Stage A: eloc kernel sweep — walker blocks for the loop head x the bf16
#          jac storage channel (VERDICT r2 item 1 levers, never measured)
# Stage B: LiH convergence A/B (VERDICT r2 item 5 + the gates for the
#          bf16-jac and sampling-precision levers)
# Stage C: ScO (progression config 4; SCF target precached by
#          scripts/precompute_scf.py)
# Stage D: benzene 2-state excited (progression config 5, token budget;
#          minimal-basis CASCI(6,6) target precached — keep the
#          scf_kwargs.basis override in sync with precompute_scf.py)
# Final:   headline bench with the promoted defaults.
set -x
cd /root/repo
mkdir -p docs/evidence

echo "=== stage A: eloc sweep ==="
timeout 4200 python scripts/ab_eloc.py \
  --variants default,jac_bf16,jac_bf16_w4,w4,jac_bf16_w8 \
  | tee docs/evidence/ab_eloc_r03_sweep.jsonl

echo "=== stage B: LiH A/B ==="
timeout 9000 python scripts/ab_lih_convergence.py --steps 1200 2>&1 | tail -20

echo "=== stage C: ScO config 4 ==="
timeout 6000 python scripts/accuracy_runs.py --only sco --steps-scale 0.6 2>&1 | tail -40

echo "=== stage D: benzene excited (token) ==="
timeout 6000 python scripts/accuracy_runs.py --only benzene_excited \
  --steps-scale 0.25 2>&1 | tail -40

echo "=== chip session done ==="

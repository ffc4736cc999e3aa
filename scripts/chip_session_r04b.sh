#!/bin/bash
# Round-4 chip session, phase 2.  ScO retried with chunked eloc (the unfused
# 1024-walker block crashed the TPU worker once; standalone eloc passes),
# benzene at a trimmed budget that fits its timeout, then the LiH A/B
# controls (r2 items) and the round-4 lever gate.
set -x
cd /root/repo
mkdir -p docs/evidence runs/logs

echo "=== stage A2: ScO ccECP, eloc walker chunk 256 ==="
DEEPQMC_TPU_ELOC_WALKER_CHUNK=256 timeout 10800 \
  python scripts/accuracy_runs.py --only sco \
  > runs/logs/r04_sco2.log 2>&1 || echo "stage A2 rc=$?"
touch /tmp/r04_stageA2.done

echo "=== stage B2: benzene 2-state excited, trimmed budget ==="
timeout 10800 python scripts/accuracy_runs.py --only benzene_excited \
  --steps-scale 0.55 \
  > runs/logs/r04_benzene2.log 2>&1 || echo "stage B2 rc=$?"
touch /tmp/r04_stageB2.done

echo "=== stage C: LiH A/B — true controls + round-4 lever gate ==="
timeout 3600 python scripts/ab_lih_convergence.py --variants baseline \
  > runs/logs/r04_ab_baseline.log 2>&1 || echo "stage C1 rc=$?"
timeout 3600 python scripts/ab_lih_convergence.py --variants inv5 \
  > runs/logs/r04_ab_inv5.log 2>&1 || echo "stage C2 rc=$?"
timeout 3600 python scripts/ab_lih_convergence.py --variants r4_all \
  > runs/logs/r04_ab_r4all.log 2>&1 || echo "stage C3 rc=$?"
touch /tmp/r04_stageC.done
echo "=== chip session r04b queue done ==="

#!/bin/bash
# Round-4 chip session: strictly serial queue on the single v5e.
# Order per VERDICT r3: the starved configs FIRST at fixed budgets, then the
# LiH A/B controls, and only then any H2O continuation (budget poured last,
# interactively).  Every stage is independent: a timeout in one never
# starves the next.
set -x
cd /root/repo
mkdir -p docs/evidence runs/logs

echo "=== stage A: ScO ccECP (progression config 4) ==="
timeout 12600 python scripts/accuracy_runs.py --only sco \
  > runs/logs/r04_sco.log 2>&1 || echo "stage A rc=$?"
touch /tmp/r04_stageA.done

echo "=== stage B: benzene 2-state excited (progression config 5) ==="
timeout 10800 python scripts/accuracy_runs.py --only benzene_excited \
  > runs/logs/r04_benzene.log 2>&1 || echo "stage B rc=$?"
touch /tmp/r04_stageB.done

echo "=== stage C: LiH A/B true controls (baseline, inv5) ==="
timeout 5400 python scripts/ab_lih_convergence.py --variants baseline \
  > runs/logs/r04_ab_baseline.log 2>&1 || echo "stage C1 rc=$?"
timeout 5400 python scripts/ab_lih_convergence.py --variants inv5 \
  > runs/logs/r04_ab_inv5.log 2>&1 || echo "stage C2 rc=$?"
touch /tmp/r04_stageC.done
echo "=== chip session r04 queue done ==="

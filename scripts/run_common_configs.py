"""Smoke-run the packaged task x ansatz configurations for a few steps.

Mirrors the reference's release smoke test (scripts/run_common_configs.py):
runs {default, ferminet, deeperwin, psiformer} x {train, evaluate} briefly.
"""

import subprocess
import sys
import tempfile
from pathlib import Path

STEPS = 10

def main():
    ansatzes = ['default', 'ferminet', 'deeperwin', 'psiformer']
    failures = []
    base = Path(tempfile.mkdtemp(prefix='deepqmc_tpu_smoke_'))
    for ansatz in ansatzes:
        workdir = base / ansatz
        cmd = [
            sys.executable, '-m', 'deepqmc_tpu',
            f'ansatz={ansatz}',
            'hamil/mol=H2',
            f'task.steps={STEPS}',
            'task.electron_batch_size=32',
            '+task.max_eq_steps=5',
            'task.pretrain_steps=null',
            'task/opt=adamw',
            '--platform=cpu',
            'ansatz.n_determinants=2',
            'ansatz.omni_factory.embedding_dim=16',
            'ansatz.omni_factory.gnn_factory.n_interactions=1',
            f'--workdir={workdir}',
        ]
        print('::', ' '.join(cmd[2:]))
        train = subprocess.run(cmd, capture_output=True, text=True)
        if train.returncode != 0:
            failures.append((ansatz, 'train', train.stderr[-2000:]))
            continue
        eval_cmd = [
            sys.executable, '-m', 'deepqmc_tpu',
            'task=evaluate',
            '--platform=cpu',
            f'task.restdir={workdir}/training',
            f'--workdir={workdir}_eval',
        ]
        print('::', ' '.join(eval_cmd[2:]))
        ev = subprocess.run(eval_cmd, capture_output=True, text=True)
        if ev.returncode != 0:
            failures.append((ansatz, 'evaluate', ev.stderr[-2000:]))
    if failures:
        for ansatz, phase, err in failures:
            print(f'FAILED {ansatz}/{phase}:\n{err}\n')
        sys.exit(1)
    print('All common configs ran successfully.')

if __name__ == '__main__':
    main()

"""CLI chain test of the evaluate_excited task: excited train -> evaluate
with oscillator-strength + spin monitors, asserting the observables land in
the evaluation result.h5 (the exact flow scripts/accuracy_runs.py drives for
the benzene progression config)."""

import os
import subprocess
import sys

import h5py
import numpy as np
import pytest

CODE = (
    'import jax; jax.config.update("jax_platforms", "cpu");'
    'from deepqmc_tpu.app import cli; cli()'
)


def run_cli(overrides, workdir, repo_root):
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    result = subprocess.run(
        [sys.executable, '-c', CODE, *overrides, f'--workdir={workdir}'],
        cwd=repo_root,
        env=env,
        capture_output=True,
        text=True,
        timeout=1500,
    )
    assert result.returncode == 0, result.stderr[-3000:]


@pytest.mark.heavy
def test_evaluate_excited_records_oscillator_strength(tmp_path):
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    train_wd = tmp_path / 'train'
    run_cli(
        [
            'task=train_excited_psiformer',
            'hamil/mol=H2',
            'task.electronic_states=2',
            'task.steps=2',
            'task.electron_batch_size=8',
            '+task.max_eq_steps=1',
            'task.pretrain_steps=null',
            'task.pretrain_kwargs.scf_kwargs.cas=[2,2]',  # unused: no pretrain
            'task/opt=adamw',
            'ansatz.n_determinants=2',
            'ansatz.omni_factory.embedding_dim=16',
            'ansatz.omni_factory.gnn_factory.n_interactions=1',
        ],
        train_wd,
        repo_root,
    )
    eval_wd = tmp_path / 'eval'
    run_cli(
        [
            'task=evaluate_excited',
            f'task.restdir={train_wd}/training',
            '+task.steps=2',
        ],
        eval_wd,
        repo_root,
    )
    with h5py.File(eval_wd / 'evaluation' / 'result.h5', 'r') as f:
        keys = list(f.keys())
        e_loc = np.asarray(f['local_energy/samples'])
        assert 'oscillator_strength' in keys, keys
        f01 = np.asarray(f['oscillator_strength/mean'])
    assert e_loc.shape[2] == 2  # two electronic states
    assert np.isfinite(e_loc).all()
    assert f01.shape[-2:] == (2, 2)
    assert np.isfinite(f01).any()
    # the off-diagonal transition strength must be genuinely computed, not a
    # placeholder: exact 0.0 was the symptom of the mol-axis gap-broadcast
    # bug (observable.py oscillator_strength_statistics)
    assert np.any(f01[..., 0, 1] != 0.0)

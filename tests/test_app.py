"""End-to-end CLI test, mirroring the reference's tests/test_app.py:6-33."""

import os
import subprocess
import sys

import pytest


@pytest.mark.heavy
def test_cli_end_to_end(tmp_path):
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = (
        'import jax; jax.config.update("jax_platforms", "cpu");'
        'from deepqmc_tpu.app import cli; cli()'
    )
    result = subprocess.run(
        [
            sys.executable,
            '-c',
            code,
            'hamil/mol=H2',
            'task.steps=1',
            'task.electron_batch_size=8',
            '+task.max_eq_steps=1',
            'task.pretrain_steps=null',
            'task/opt=adamw',
            'ansatz.n_determinants=2',
            'ansatz.omni_factory.embedding_dim=16',
            'ansatz.omni_factory.gnn_factory.n_interactions=1',
            f'--workdir={tmp_path}',
        ],
        cwd=repo_root,
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert result.returncode == 0, result.stderr[-3000:]
    files = os.listdir(tmp_path)
    assert 'deepqmc.log' in files
    assert 'training' in files
    training_files = os.listdir(tmp_path / 'training')
    assert 'result.h5' in training_files
    assert any('tfevents' in f for f in training_files)
    with open(tmp_path / 'deepqmc.log') as f:
        log_text = f.read()
    assert 'Equilibrating sampler...' in log_text
    assert 'Start training' in log_text
    assert 'The training has been completed!' in log_text
    # composed config persisted for restart tasks
    assert (tmp_path / '.hydra' / 'config.yaml').exists()

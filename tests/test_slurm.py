"""SLURM launcher: sbatch rendering and dry-run submission via the CLI."""

import subprocess
import sys
from pathlib import Path

import pytest

from deepqmc_tpu.slurm import render_sbatch, submit

REPO = Path(__file__).parent.parent


def test_render_sbatch_directives():
    script = render_sbatch(
        '/tmp/wd',
        ['task.steps=5', 'hamil/mol=H2'],
        {
            'nodes': 4,
            'tasks_per_node': 1,
            'partition': 'tpu',
            'time': '2-00:00:00',
            'setup': ['module load cuda'],
        },
    )
    assert script.startswith('#!/bin/bash')
    assert '#SBATCH --nodes=4' in script
    assert '#SBATCH --partition=tpu' in script
    assert '#SBATCH --time=2-00:00:00' in script
    assert 'module load cuda' in script
    assert 'export DEEPQMC_TPU_MULTIHOST=1' in script
    assert 'srun python -m deepqmc_tpu task.steps=5' in script
    assert '--workdir=/tmp/wd' in script


def test_render_rejects_unknown_options():
    with pytest.raises(ValueError, match='Unknown slurm options'):
        render_sbatch('/tmp/wd', [], {'nodez': 2})


def test_submit_dry_run(tmp_path):
    job = submit(str(tmp_path), ['task.steps=1'], {'nodes': 2}, dry_run=True)
    assert job is None
    script = (tmp_path / 'launch.sbatch').read_text()
    assert '#SBATCH --nodes=2' in script


def test_cli_slurm_dry(tmp_path):
    out = subprocess.run(
        [
            sys.executable,
            '-m',
            'deepqmc_tpu',
            'task.steps=1',
            'hamil/mol=H2',
            '+slurm.nodes=2',
            '+slurm.partition=v5e',
            f'--workdir={tmp_path}',
            '--slurm-dry',
        ],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr
    script = (tmp_path / 'launch.sbatch').read_text()
    assert '#SBATCH --nodes=2' in script
    assert '#SBATCH --partition=v5e' in script
    assert 'hamil/mol=H2' in script

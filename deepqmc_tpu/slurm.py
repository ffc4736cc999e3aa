"""SLURM launcher: submit multi-host training runs as batch jobs.

The reference launches multi-node runs through hydra's submitit plugin
(/root/reference/src/deepqmc/conf/config_slurm.yaml, conf/hydra/launcher/
slurm.yaml) with per-process workdir suffixes (conf/custom_resolvers.py:9-21).
submitit is not a dependency here; instead this module renders a plain sbatch
script in the workdir and submits it.  Every SLURM task re-runs the same CLI
with ``DEEPQMC_TPU_MULTIHOST=1``, so ``jax.distributed.initialize()`` wires
the hosts together (parallel.py: on TPU pods the coordinator is
auto-detected, on CPU/GPU clusters it reads the SLURM env), and each process
logs into ``training_<process_index>/`` via
:func:`deepqmc_tpu.train.process_idx_suffix`.

Config surface (``slurm`` section of the composed config, all optional):
nodes, tasks_per_node, partition, account, qos, time, mem, constraint,
gres, setup (list of shell lines, e.g. environment activation).
"""

import logging
import os
import shlex
import subprocess
from pathlib import Path
from typing import Optional

log = logging.getLogger(__name__)

__all__ = ['render_sbatch', 'submit']

_DIRECTIVES = {
    'nodes': '--nodes={}',
    'tasks_per_node': '--ntasks-per-node={}',
    'partition': '--partition={}',
    'account': '--account={}',
    'qos': '--qos={}',
    'time': '--time={}',
    'mem': '--mem={}',
    'constraint': '--constraint={}',
    'gres': '--gres={}',
    'cpus_per_task': '--cpus-per-task={}',
}

DEFAULTS = {'nodes': 1, 'tasks_per_node': 1, 'time': '14-00:00:00'}


def render_sbatch(
    workdir: str, overrides: list[str], slurm_cfg: Optional[dict] = None
) -> str:
    """Render the sbatch script text for one training run."""
    cfg = {**DEFAULTS, **(slurm_cfg or {})}
    setup_lines = cfg.pop('setup', None) or []
    job_name = cfg.pop('name', 'deepqmc_tpu')
    unknown = set(cfg) - set(_DIRECTIVES)
    if unknown:
        raise ValueError(f'Unknown slurm options: {sorted(unknown)}')
    directives = [
        f'#SBATCH {_DIRECTIVES[key].format(value)}'
        for key, value in cfg.items()
        if value is not None
    ]
    cli_args = ' '.join(
        shlex.quote(arg) for arg in [*overrides, f'--workdir={workdir}']
    )
    lines = [
        '#!/bin/bash',
        f'#SBATCH --job-name={job_name}',
        f'#SBATCH --output={workdir}/slurm-%j.out',
        *directives,
        '',
        *setup_lines,
        '',
        'export DEEPQMC_TPU_MULTIHOST=1',
        f'srun python -m deepqmc_tpu {cli_args}',
        '',
    ]
    return '\n'.join(lines)


def submit(
    workdir: str,
    overrides: list[str],
    slurm_cfg: Optional[dict] = None,
    dry_run: bool = False,
) -> Optional[str]:
    """Write the sbatch script into the workdir and submit it.

    Returns the job id, or ``None`` on a dry run (script written, not
    submitted).
    """
    workdir = str(Path(workdir).absolute())
    os.makedirs(workdir, exist_ok=True)
    script = render_sbatch(workdir, overrides, slurm_cfg)
    script_path = Path(workdir) / 'launch.sbatch'
    script_path.write_text(script)
    log.info(f'Wrote sbatch script to {script_path}')
    if dry_run:
        return None
    out = subprocess.run(
        ['sbatch', '--parsable', str(script_path)],
        check=True,
        capture_output=True,
        text=True,
    )
    job_id = out.stdout.strip()
    log.info(f'Submitted SLURM job {job_id}')
    return job_id

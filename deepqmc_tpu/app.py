"""CLI application (reference: /root/reference/src/deepqmc/app.py).

``python -m deepqmc_tpu [overrides...]`` mirrors the reference's ``deepqmc``
console script: Hydra-style overrides compose the packaged config tree, the
task runs in a working directory, and the composed config is saved so
restart/evaluate tasks can find it.
"""

import logging
import os
import platform
import sys
from pathlib import Path
from typing import Optional, Union

import yaml
from tqdm.auto import tqdm

from .config import compose, instantiate
from .molecule import Molecule, read_molecule_dataset
from .validate_kwargs import validate_kwargs

__all__ = ()
log = logging.getLogger(__name__)
PACKAGE_LOGGER = logging.getLogger('deepqmc_tpu')


def read_molecules(
    directory: Union[Path, str, None] = None, whitelist: Optional[str] = None
) -> Optional[list[Molecule]]:
    """Load a molecule dataset directory for transferable training."""
    if directory is None:
        return None
    path = Path(directory).absolute()
    log.info(f'Reading molecules from {path}')
    molecules = read_molecule_dataset(path, whitelist)
    log.info(f'Read {len(molecules)} molecules: {", ".join(molecules)}')
    if not molecules:
        raise ValueError(
            f'No molecules found in {path} with whitelist {whitelist!r}.'
        )
    return list(molecules.values())


def instantiate_ansatz(hamil, ansatz):
    from .wf.base import instantiate_ansatz as _instantiate

    return _instantiate(hamil, ansatz)


def train_from_factories(hamil, ansatz, **kwargs):
    from .train import train

    ansatz = instantiate_ansatz(hamil, ansatz)
    return train(hamil, ansatz, **kwargs)


def assert_valid_restdir(restdir: Path, workdir: str):
    if not restdir.is_dir():
        raise ValueError(f'restdir {restdir!r} is not a directory')
    if str(restdir.parent) == str(workdir):
        raise ValueError(
            'Cannot restore from the directory you are running in; choose a'
            ' different workdir.'
        )


def task_from_workdir(workdir, chkpt):
    from .log import CheckpointStore

    workdir = Path(workdir)
    assert workdir.is_dir(), f'{workdir} is not a directory'
    cfg_path = workdir / '.hydra' / 'config.yaml'
    if not cfg_path.exists():
        cfg_path = workdir.parent / '.hydra' / 'config.yaml'
    with open(cfg_path) as f:
        cfg = yaml.safe_load(f)
    if chkpt == 'LAST':
        chkpts = list(workdir.glob(CheckpointStore.PATTERN.format('*')))
        if not chkpts:
            chkpts = list(
                (workdir / 'training').glob(CheckpointStore.PATTERN.format('*'))
            )
        chkpt = sorted(
            chkpts,
            key=lambda p: CheckpointStore.extract_step_from_filename(p.name),
        )[-1]
    else:
        chkpt = workdir / chkpt
    step, train_state = CheckpointStore.load(chkpt)
    return cfg, step, train_state


def train_from_checkpoint(workdir, restdir, evaluate, chkpt='LAST', **kwargs):
    """Restart or evaluate from a previous run's checkpoint."""
    restdir = Path(restdir).absolute()
    assert_valid_restdir(restdir, workdir)
    cfg, step, train_state = task_from_workdir(restdir, chkpt)
    while cfg['task'].get('restdir', False):
        restdir = Path(cfg['task']['restdir']).absolute()
        assert_valid_restdir(restdir, workdir)
        cfg, *_ = task_from_workdir(restdir, 'LAST')
    log.info(f'Found original config file in {restdir}')
    cfg['task']['workdir'] = str(workdir)
    if not kwargs.pop('keep_sampler_state', not evaluate):
        train_state = train_state._replace(sampler=None)
    if evaluate:
        cfg['task']['opt'] = None
        train_state = train_state._replace(opt=None)
    else:
        cfg['task']['init_step'] = step
    # the traced program comes from the ORIGINAL run's config (plus the
    # opt=None evaluation override), not the outer restart/evaluate task —
    # re-key the AOT cache accordingly
    from . import aot

    volatile = ('workdir', 'restdir', 'init_step', 'seed', 'steps', 'chkpt')
    aot.set_run_description(
        yaml.safe_dump(
            {
                **{k: v for k, v in cfg.items() if k != 'task'},
                'task': {
                    k: v for k, v in cfg['task'].items() if k not in volatile
                },
                'evaluate': evaluate,
            },
            sort_keys=True,
        )
    )
    instantiate(cfg['task'], root=cfg, train_state=train_state, **kwargs)


class TqdmStream:
    @staticmethod
    def write(msg: str) -> int:
        try:
            tqdm.write(msg, end='')
        except BrokenPipeError:
            sys.stderr.write(msg)
            return 0
        return len(msg)


def setup_logging(cfg):
    handler = logging.StreamHandler(TqdmStream)
    handler.setFormatter(
        logging.Formatter('[%(asctime)s] %(levelname)s:%(name)s: %(message)s')
    )
    PACKAGE_LOGGER.addHandler(handler)
    PACKAGE_LOGGER.setLevel(cfg.get('logging', {}).get('deepqmc_tpu', logging.INFO))
    logging.getLogger('jax').setLevel(cfg.get('logging', {}).get('jax', 40))
    workdir = cfg['task'].get('workdir')
    if workdir:
        file_handler = logging.FileHandler(
            os.path.join(workdir, 'deepqmc.log'), mode='a'
        )
        file_handler.setFormatter(
            logging.Formatter('[%(asctime)s] %(levelname)s:%(name)s: %(message)s')
        )
        PACKAGE_LOGGER.addHandler(file_handler)


def detect_devices():
    import jax

    device_kinds = [device.device_kind for device in jax.devices()]
    n_device = len(device_kinds)
    n_process = jax.process_count()
    log.info(f'Process {jax.process_index()} running on {platform.node()}')
    log.info(
        f'Running on {n_device} {device_kinds[0].upper()}'
        f'{"" if n_device == 1 else "s"} with {n_process}'
        f' process{"" if n_process == 1 else "es"}'
    )


def main(cfg, workdir: Optional[str] = None):
    workdir = workdir or cfg['task'].get('workdir')
    if not workdir or workdir == '???':
        workdir = str(Path.cwd())
    cfg['task']['workdir'] = str(workdir)
    os.makedirs(workdir, exist_ok=True)
    setup_logging(cfg)
    log.info('Entering application')
    detect_devices()
    log.info(f'Will work in {workdir}')
    # persist the composed config (hydra-compatible location) for restarts
    hydra_dir = Path(workdir) / '.hydra'
    hydra_dir.mkdir(exist_ok=True)
    with open(hydra_dir / 'config.yaml', 'w') as f:
        yaml.safe_dump(cfg, f)
    validate_kwargs(cfg['task'])
    # key the AOT executable cache (aot.py) on the composed config, minus
    # run-location/progress knobs that do not change the traced program
    from . import aot

    volatile = ('workdir', 'restdir', 'init_step', 'seed', 'steps', 'chkpt')
    aot.set_run_description(
        yaml.safe_dump(
            {
                **{k: v for k, v in cfg.items() if k != 'task'},
                'task': {
                    k: v for k, v in cfg['task'].items() if k not in volatile
                },
            },
            sort_keys=True,
        )
    )
    instantiate(cfg['task'], root=cfg)


def cli(argv: Optional[list[str]] = None):
    """Entry point: ``python -m deepqmc_tpu key=value group=option ...``."""
    argv = sys.argv[1:] if argv is None else argv
    workdir = None
    slurm_mode = None
    overrides = []
    for arg in argv:
        if arg.startswith('--workdir='):
            workdir = arg.split('=', 1)[1]
        elif arg in ('--slurm', '--slurm-dry'):
            # submit (or just render, with --slurm-dry) this run as a SLURM
            # batch job instead of running it in-process
            slurm_mode = arg
        elif arg.startswith('--platform='):
            # sitecustomize may pre-import jax with another platform; the
            # config route still switches backends reliably
            import jax

            jax.config.update('jax_platforms', arg.split('=', 1)[1])
        elif arg in ('-h', '--help'):
            print(__doc__)
            print('Override syntax: key.sub=value, group=option, +new.key=value')
            return
        else:
            overrides.append(arg)
    cfg = compose(overrides=overrides)
    if slurm_mode:
        from .slurm import submit

        logging.basicConfig(level=logging.INFO)
        submit(
            workdir or cfg['task'].get('workdir') or str(Path.cwd()),
            overrides,
            cfg.get('slurm'),
            dry_run=slurm_mode == '--slurm-dry',
        )
        return
    try:
        main(cfg, workdir=workdir)
    except KeyboardInterrupt:
        log.warning('Interrupted!')

"""High-level training/evaluation driver.

Covers the responsibilities of the reference's ``train()``
(/root/reference/src/deepqmc/train.py:44-367) — sampler setup, optional SCF
pretraining, equilibration, the fused fit loop, checkpointing, logging and
NaN-triggered rewinds — organized as a :class:`TrainSession` whose phases
(``pretrain_phase`` / ``equilibration_phase`` / ``fit_phase``) each own their
progress reporting, with all host-side sinks grouped in :class:`RunSinks`.
"""

import logging
import math
import os
import time
from collections.abc import Callable, Sequence
from functools import partial
from itertools import count
from typing import Optional, Type

import jax
import numpy as np
import optax
from tqdm.auto import tqdm, trange

from .ewm import init_multi_mol_multi_state_ewm
from .exceptions import NanError, TrainingBlowup, TrainingCrash
from .fit import fit_wf
from .log import CheckpointStore, H5Logger, MetricLogger, TensorboardMetricLogger
from .loss.clip import median_log_squeeze_and_mask
from .loss.loss_function import LossFunctionFactory, create_loss_fn
from .molecule import Molecule
from .observable import ObservableMonitor, default_observable_monitors
from .optimizer import NoOptimizer
from .physics import pairwise_self_distance
from .sampling import equilibrate, initialize_sampler_state
from .types import Ansatz, TrainState
from .wf.base import init_wf_params

__all__ = ['train']

log = logging.getLogger(__name__)


def format_uncertainty(mean: float, err: float) -> str:
    """'−8.0700(19)'-style formatting of a value with uncertainty."""
    if not np.isfinite(mean) or not np.isfinite(err) or err <= 0:
        return f'{mean:.4f}(nan)'
    digits = max(0, -int(math.floor(math.log10(err))) + 1)
    err_digits = round(err * 10**digits)
    return f'{mean:.{digits}f}({err_digits})'


def process_idx_suffix() -> str:
    idx = jax.process_index()
    return f'_{idx}' if jax.process_count() > 1 else ''


def _grid_repr(values, fmt) -> str:
    """'(a|b)|(c|d)' rendering of a [mol, state] grid of numbers."""
    return '|'.join(
        '(' + '|'.join(fmt(v) for v in np.atleast_1d(row)) + ')'
        for row in np.asarray(values)
    )


class RunSinks:
    """The host-side outputs of a run: checkpoints, tensorboard, HDF5.

    Inactive (all sinks ``None``) when no workdir is given; ``close()`` is
    safe either way.
    """

    def __init__(
        self,
        workdir: Optional[str],
        mode: str,
        monitor_names: Sequence[str],
        mols: Sequence[Molecule],
        molecule_batch_size: int,
        init_step: int,
        chkpt_constructor: Optional[Type[CheckpointStore]],
        metric_logger_constructor: Optional[Type[MetricLogger]],
        h5_logger_constructor: Optional[Type[H5Logger]],
    ):
        self.workdir = None
        self.chkpts: Optional[CheckpointStore] = None
        self.metrics: Optional[MetricLogger] = None
        self.h5: Optional[H5Logger] = None
        self.start_time = time.time()
        if not workdir:
            return
        self.workdir = os.path.join(workdir, mode + process_idx_suffix())
        os.makedirs(self.workdir, exist_ok=True)
        self.chkpts = (chkpt_constructor or CheckpointStore)(self.workdir)
        self.metrics = (metric_logger_constructor or TensorboardMetricLogger)(
            self.workdir, molecule_batch_size
        )
        self.h5 = (h5_logger_constructor or H5Logger)(
            self.workdir,
            list(monitor_names),
            init_step=init_step,
            aux_data={f'mol-{i}': np.asarray(m.coords) for i, m in enumerate(mols)},
        )

    def log_metrics(self, step, stats, single_stats, mol_idxs, prefix=None):
        if self.metrics:
            kwargs = {'prefix': prefix} if prefix else {}
            self.metrics.update(step, stats, single_stats, mol_idxs, **kwargs)

    def close(self):
        for sink in (self.chkpts, self.metrics, self.h5):
            if sink is not None:
                sink.close()


class TrainSession:
    """One training or evaluation run, split into its three device phases."""

    def __init__(
        self,
        hamil,
        ansatz: Ansatz,
        opt,
        sampler_factory: Callable,
        *,
        seed: int,
        electron_batch_size: int,
        molecule_batch_size: int,
        electronic_states: int,
        mols: Optional[Sequence[Molecule]],
        observable_monitors: Optional[list[ObservableMonitor]],
    ):
        self.hamil = hamil
        self.ansatz = ansatz
        self.opt_factory = opt or NoOptimizer
        self.mode = 'evaluation' if opt is None else 'training'
        self.rng = jax.random.PRNGKey(seed + jax.process_index())
        self.electron_batch_size = electron_batch_size
        self.electronic_states = electronic_states
        self.mols = list(mols) if isinstance(mols, Sequence) else [hamil.mol]
        self.molecule_idx_sampler, self.sampler = sampler_factory(
            self._fork_rng(),
            hamil,
            ansatz,
            self.mols,
            electronic_states,
            molecule_batch_size,
        )
        self.monitors = default_observable_monitors() + (observable_monitors or [])

    def _fork_rng(self):
        self.rng, out = jax.random.split(self.rng)
        return out

    def _aot_cache(self):
        """Executable cache for the fused training block (aot.py).

        Active only when the CLI installed a run description (the composed
        config) and the run is single-process; the molecule geometries are
        appended since dataset molecules are not part of the config."""
        from . import aot

        run_desc = aot.get_run_description()
        if run_desc is None or jax.process_count() > 1:
            return None
        mols_desc = [
            (
                np.asarray(m.coords).tolist(),
                np.asarray(m.charges).tolist(),
                int(m.charge),
                int(m.spin),
            )
            for m in self.mols
        ]
        return aot.AotCache('train_block', (run_desc, mols_desc, self.mode))

    # -- phases --------------------------------------------------------------

    def init_params(self, merge_keys):
        return init_wf_params(
            self._fork_rng(),
            self.hamil,
            self.ansatz,
            self.electronic_states,
            merge_keys=merge_keys,
        )

    def pretrain_phase(self, params, n_steps, kwargs, sinks: RunSinks):
        """Fit orbitals to an SCF baseline before variational optimization."""
        from .pretrain import compute_scf_solution, pretrain

        log.info('Pretraining wrt. baseline wave function')
        kwargs = dict(kwargs or {})
        dataset = compute_scf_solution(
            self.mols,
            self.hamil,
            self.electronic_states,
            workdir=kwargs.pop('pyscf_chkpt_path', None) or sinks.workdir,
            **kwargs.pop('scf_kwargs', {}),
        )
        opt_pretrain = getattr(optax, kwargs.pop('opt', 'adam'))(
            **kwargs.pop('opt_kwargs', {'learning_rate': 3.0e-4})
        )
        mse_ewm, update_ewm = init_multi_mol_multi_state_ewm(
            shape=(len(self.mols), self.electronic_states), decay_alpha=1.0
        )
        smpl_state = initialize_sampler_state(
            self._fork_rng(),
            self.sampler,
            params,
            self.electron_batch_size,
            self.mols,
        )
        log.info('Pretraining: sampler state initialized, compiling step...')
        mse_rep = None
        with tqdm(range(n_steps), desc='pretrain', disable=None) as pbar:
            for step, params, losses, mol_idxs in pretrain(  # noqa: B007
                self._fork_rng(),
                self.hamil,
                self.ansatz,
                params,
                opt_pretrain,
                self.molecule_idx_sampler,
                self.sampler,
                smpl_state,
                dataset,
                steps=pbar,
            ):
                per_mol = losses.mean(axis=-1)
                mse_ewm = update_ewm(per_mol, mse_ewm, mol_idxs)
                mse_rep = _grid_repr(mse_ewm.mean, '{:0.2e}'.format)
                pbar.set_postfix(MSE=mse_rep)
                sinks.log_metrics(
                    step,
                    {'MSE': per_mol, 'MSE/ewm': mse_ewm.mean},
                    {},
                    mol_idxs,
                    prefix='pretraining',
                )
        log.info(f'Pretraining completed with MSE = {mse_rep}')
        return params

    def equilibration_phase(
        self, params, max_eq_steps, allow_early_stopping, sinks: RunSinks
    ):
        """Burn in fresh walkers until their spread statistic stabilizes."""
        smpl_state = initialize_sampler_state(
            self._fork_rng(),
            self.sampler,
            params,
            self.electron_batch_size,
            self.mols,
        )
        log.info('Equilibrating sampler...')
        steps = count() if max_eq_steps is None else range(max_eq_steps)
        with tqdm(steps, desc='equilibrate sampler', disable=None) as pbar:
            for step, smpl_state, mol_idxs, smpl_stats in equilibrate(  # noqa: B007
                self._fork_rng(),
                params,
                self.molecule_idx_sampler,
                self.sampler,
                smpl_state,
                lambda pc: pairwise_self_distance(pc.r).mean(),
                pbar,
                block_size=10,
                allow_early_stopping=allow_early_stopping,
            ):
                pbar.set_postfix(
                    tau=_grid_repr(smpl_state['elec']['tau'], '{:.3f}'.format)
                )
                sinks.log_metrics(
                    step, {}, smpl_stats, mol_idxs, prefix='equilibration'
                )
        return smpl_state

    def fit_phase(
        self,
        train_state: TrainState,
        steps_range,
        loss_function_factory,
        fit_block_size: int,
        sinks: RunSinks,
        progress: 'ProgressTracker',
    ):
        """The optimization loop proper; yields nothing, mutates sinks."""
        for step, train_state, mol_idxs, stats, samples in fit_wf(
            self._fork_rng(),
            self.hamil,
            self.ansatz,
            self.opt_factory,
            self.molecule_idx_sampler,
            self.sampler,
            steps_range,
            train_state,
            loss_function_factory,
            observable_monitors=[
                m.finalize(self.hamil, self.ansatz.apply) for m in self.monitors
            ],
            block_size=fit_block_size,
            aot_cache=self._aot_cache(),
        ):
            progress.update(steps_range, mol_idxs, stats)
            if np.isnan(np.asarray(samples['psi/samples']['log'])).any():
                raise NanError()
            if sinks.workdir:
                if self.mode == 'training' and sinks.chkpts:
                    # chkpt-i contains the step i-1 -> i
                    sinks.chkpts.update(
                        step + 1,
                        train_state,
                        float(np.asarray(stats['local_energy/std']).mean()),
                    )
                sinks.log_metrics(step, stats, {}, mol_idxs)
                assert sinks.h5 is not None
                sinks.h5.update(
                    {
                        **samples,
                        'mol_idxs': mol_idxs,
                        'step': step,
                        'time': time.time() - sinks.start_time,
                        **stats,
                    }
                )
        return train_state


class ProgressTracker:
    """EWM-energy progress rendering and improvement logging."""

    def __init__(self, n_mols: int, n_states: int):
        self.energies = [[(float('nan'), 1.0)] * n_states for _ in range(n_mols)]
        self.best = None

    def update(self, pbar, mol_idxs, stats):
        means = np.asarray(stats['energy/ewm'])
        errs = np.asarray(stats['energy/ewm_error'])
        for i, mol_idx in enumerate(np.asarray(mol_idxs)):
            self.energies[mol_idx] = [
                (float(m), float(s))
                for m, s in zip(np.atleast_1d(means[i]), np.atleast_1d(errs[i]))
            ]
        rendered = '|'.join(
            '(' + '|'.join(format_uncertainty(m, s) for m, s in row) + ')'
            for row in self.energies
        )
        pbar.set_postfix(E=rendered)
        # a nan best (EWM warmup) must not freeze the log: treat it as
        # always-improvable, otherwise `s < 0.5 * nan` never fires again
        halved = self.best is None or any(
            not np.isfinite(best_s) or s < 0.5 * best_s
            for row, best_row in zip(self.energies, self.best)
            for (_, s), (_, best_s) in zip(row, best_row)
        )
        if halved:
            self.best = [list(row) for row in self.energies]
            log.info(f'Progress: {pbar.n + 1}/{pbar.total}, energy = {rendered}')


def train(
    hamil,
    ansatz: Ansatz,
    opt,
    sampler_factory: Callable,
    steps: int,
    seed: int,
    electron_batch_size: int,
    molecule_batch_size: int = 1,
    electronic_states: int = 1,
    mols: Optional[list[Molecule]] = None,
    workdir: Optional[str] = None,
    train_state: Optional[TrainState] = None,
    init_step: int = 0,
    max_restarts: int = 3,
    max_eq_steps: int = 1000,
    eq_allow_early_stopping: bool = True,
    pretrain_steps: Optional[int] = None,
    pretrain_kwargs: Optional[dict] = None,
    chkpt_constructor: Optional[Type[CheckpointStore]] = None,
    metric_logger_constructor: Optional[Type[MetricLogger]] = None,
    h5_logger_constructor: Optional[Type[H5Logger]] = None,
    merge_keys: Optional[list[str]] = None,
    loss_function_factory: Optional[LossFunctionFactory] = None,
    observable_monitors: Optional[list[ObservableMonitor]] = None,
    fit_block_size: int = 1,
):
    """Train or evaluate a wave-function model (reference train.py:44-367).

    ``opt`` is an :class:`~deepqmc_tpu.optimizer.Optimizer` factory taking the
    loss-and-grad function, or ``None`` for evaluation.
    """
    session = TrainSession(
        hamil,
        ansatz,
        opt,
        sampler_factory,
        seed=seed,
        electron_batch_size=electron_batch_size,
        molecule_batch_size=molecule_batch_size,
        electronic_states=electronic_states,
        mols=mols,
        observable_monitors=observable_monitors,
    )
    sinks = RunSinks(
        workdir,
        session.mode,
        [m.name for m in session.monitors],
        session.mols,
        molecule_batch_size,
        init_step,
        chkpt_constructor,
        metric_logger_constructor,
        h5_logger_constructor,
    )
    loss_function_factory = loss_function_factory or partial(
        create_loss_fn, clip_mask_fn=median_log_squeeze_and_mask
    )
    try:
        if train_state:
            log.info(
                f'Restart training from step {init_step}'
                if session.mode == 'training'
                else 'Start evaluation'
            )
        else:
            params = session.init_params(merge_keys)
            if pretrain_steps and session.mode == 'training':
                params = session.pretrain_phase(
                    params, pretrain_steps, pretrain_kwargs, sinks
                )
            train_state = TrainState(None, params, None)
        if train_state.sampler is None:
            smpl_state = session.equilibration_phase(
                train_state.params, max_eq_steps, eq_allow_early_stopping, sinks
            )
            train_state = TrainState(smpl_state, train_state.params, None)
            if sinks.chkpts and session.mode == 'training':
                sinks.chkpts.update(init_step, train_state)
            log.info(f'Start {session.mode}')

        progress = ProgressTracker(len(session.mols), electronic_states)
        step = init_step
        for attempt in range(max_restarts):
            pbar = trange(
                init_step,
                steps,
                initial=init_step,
                total=steps,
                desc=session.mode,
                disable=None,
            )
            try:
                with pbar:
                    train_state = session.fit_phase(
                        train_state,
                        pbar,
                        loss_function_factory,
                        fit_block_size,
                        sinks,
                        progress,
                    )
                log.info(f'The {session.mode} has been completed!')
                return train_state
            except (NanError, TrainingBlowup) as e:
                step = pbar.n
                log.warning(f'Restarting due to {type(e).__name__}...')
                if attempt < max_restarts and sinks.chkpts and sinks.chkpts.chkpts:
                    init_step, train_state = sinks.chkpts.last
                    session._fork_rng()
        log.warning(
            f'The {session.mode} has crashed before all steps were completed'
            f' ({step}/{steps})!'
        )
        raise TrainingCrash(train_state)
    finally:
        sinks.close()

"""High-level training/evaluation driver.

Reference: /root/reference/src/deepqmc/train.py.  Orchestrates sampler
initialization, optional SCF pretraining, equilibration, the fused fit loop,
checkpointing, logging, and NaN-triggered rewinds.
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
import jax.numpy as jnp
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
from .types import Ansatz, KeyArray, TrainState
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


def train(  # noqa: C901
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
    mode = 'evaluation' if opt is None else 'training'
    rng = jax.random.PRNGKey(seed + jax.process_index())
    rng, rng_smpl = jax.random.split(rng)
    mols = mols if isinstance(mols, Sequence) else [hamil.mol]
    molecule_idx_sampler, sampler = sampler_factory(
        rng_smpl, hamil, ansatz, mols, electronic_states, molecule_batch_size
    )
    opt = opt or NoOptimizer
    observable_monitors = default_observable_monitors() + (observable_monitors or [])
    chkpts = None
    metric_logger = None
    h5_logger = None
    init_time = None
    if workdir:
        workdir = os.path.join(workdir, mode + process_idx_suffix())
        os.makedirs(workdir, exist_ok=True)
        chkpts = (chkpt_constructor or CheckpointStore)(workdir)
        metric_logger = (metric_logger_constructor or TensorboardMetricLogger)(
            workdir, molecule_batch_size
        )
        h5_logger = (h5_logger_constructor or H5Logger)(
            workdir,
            [monitor.name for monitor in observable_monitors],
            init_step=init_step,
            aux_data={f'mol-{i}': np.asarray(m.coords) for i, m in enumerate(mols)},
        )
        init_time = time.time()

    pbar = None
    try:
        if train_state:
            log.info(
                {
                    'training': f'Restart training from step {init_step}',
                    'evaluation': 'Start evaluation',
                }[mode]
            )
            params = train_state.params
        else:
            rng, rng_init = jax.random.split(rng)
            params = init_wf_params(
                rng_init, hamil, ansatz, electronic_states, merge_keys=merge_keys
            )
            if pretrain_steps and mode == 'training':
                log.info('Pretraining wrt. baseline wave function')
                from .pretrain import compute_scf_solution, pretrain

                rng, rng_pretrain = jax.random.split(rng)
                pretrain_kwargs = dict(pretrain_kwargs or {})
                pretrain_dataset = compute_scf_solution(
                    mols,
                    hamil,
                    electronic_states,
                    workdir=pretrain_kwargs.pop('pyscf_chkpt_path', None) or workdir,
                    **pretrain_kwargs.pop('scf_kwargs', {}),
                )
                opt_pretrain = getattr(optax, pretrain_kwargs.pop('opt', 'adam'))(
                    **pretrain_kwargs.pop('opt_kwargs', {'learning_rate': 3.0e-4})
                )
                ewm_state, update_ewm = init_multi_mol_multi_state_ewm(
                    shape=(len(mols), electronic_states), decay_alpha=1.0
                )
                mse_rep = None
                rng, rng_pre_init = jax.random.split(rng)
                pretrain_smpl_state = initialize_sampler_state(
                    rng_pre_init, sampler, params, electron_batch_size, mols
                )
                pbar = tqdm(range(pretrain_steps), desc='pretrain', disable=None)
                for step, params, losses, mol_idxs in pretrain(  # noqa: B007
                    rng_pretrain,
                    hamil,
                    ansatz,
                    params,
                    opt_pretrain,
                    molecule_idx_sampler,
                    sampler,
                    pretrain_smpl_state,
                    pretrain_dataset,
                    steps=pbar,
                ):
                    per_mol_losses = losses.mean(axis=-1)
                    ewm_state = update_ewm(per_mol_losses, ewm_state, mol_idxs)
                    mse_rep = '|'.join(
                        '(' + '|'.join(f'{m:0.2e}' for m in row) + ')'
                        for row in np.asarray(ewm_state.mean)
                    )
                    pbar.set_postfix(MSE=mse_rep)
                    if metric_logger:
                        metric_logger.update(
                            step,
                            {'MSE': per_mol_losses, 'MSE/ewm': ewm_state.mean},
                            {},
                            mol_idxs,
                            prefix='pretraining',
                        )
                pbar.close()
                log.info(f'Pretraining completed with MSE = {mse_rep}')

        if train_state is None or train_state.sampler is None:
            rng, rng_eq, rng_smpl_init = jax.random.split(rng, 3)
            smpl_state = initialize_sampler_state(
                rng_smpl_init, sampler, params, electron_batch_size, mols
            )
            log.info('Equilibrating sampler...')
            pbar = tqdm(
                count() if max_eq_steps is None else range(max_eq_steps),
                desc='equilibrate sampler',
                disable=None,
            )
            for _step, smpl_state, mol_idxs, smpl_stats in equilibrate(  # noqa: B007
                rng_eq,
                params,
                molecule_idx_sampler,
                sampler,
                smpl_state,
                lambda pc: pairwise_self_distance(pc.r).mean(),
                pbar,
                block_size=10,
                allow_early_stopping=eq_allow_early_stopping,
            ):
                tau_rep = '|'.join(
                    '(' + '|'.join(f'{t:.3f}' for t in row) + ')'
                    for row in np.asarray(smpl_state['elec']['tau'])
                )
                pbar.set_postfix(tau=tau_rep)
                if metric_logger:
                    metric_logger.update(
                        _step, {}, smpl_stats, mol_idxs, prefix='equilibration'
                    )
            pbar.close()
            train_state = TrainState(smpl_state, params, None)
            if workdir and mode == 'training':
                assert chkpts
                chkpts.update(init_step, train_state)
            log.info(f'Start {mode}')
        loss_function_factory = loss_function_factory or partial(
            create_loss_fn, clip_mask_fn=median_log_squeeze_and_mask
        )
        best_ene = None
        step = init_step
        ewm_energies = [
            [(float('nan'), 1.0)] * electronic_states for _ in range(len(mols))
        ]
        for attempt in range(max_restarts):
            try:
                pbar = trange(
                    init_step,
                    steps,
                    initial=init_step,
                    total=steps,
                    desc=mode,
                    disable=None,
                )
                for (
                    step,
                    train_state,
                    mol_idxs,
                    stats,
                    observable_samples,
                ) in fit_wf(  # noqa: B007
                    rng,
                    hamil,
                    ansatz,
                    opt,
                    molecule_idx_sampler,
                    sampler,
                    pbar,
                    train_state,
                    loss_function_factory,
                    observable_monitors=[
                        monitor.finalize(hamil, ansatz.apply)
                        for monitor in observable_monitors
                    ],
                    block_size=fit_block_size,
                ):
                    ewm_energies, best_ene = update_progress(
                        pbar, best_ene, ewm_energies, mol_idxs, stats
                    )
                    if np.isnan(
                        np.asarray(observable_samples['psi/samples']['log'])
                    ).any():
                        raise NanError()
                    if workdir:
                        assert init_time is not None and h5_logger is not None
                        if mode == 'training':
                            assert chkpts
                            # chkpt-i contains the step i-1 -> i
                            chkpts.update(
                                step + 1,
                                train_state,
                                float(np.asarray(stats['local_energy/std']).mean()),
                            )
                        if metric_logger:
                            metric_logger.update(step, stats, {}, mol_idxs)
                        observable_samples |= {
                            'mol_idxs': mol_idxs,
                            'step': step,
                            'time': time.time() - init_time,
                            **stats,
                        }
                        h5_logger.update(observable_samples)
                log.info(f'The {mode} has been completed!')
                return train_state
            except (NanError, TrainingBlowup) as e:
                if pbar:
                    pbar.close()
                log.warning(f'Restarting due to {type(e).__name__}...')
                if attempt < max_restarts and chkpts is not None and chkpts.chkpts:
                    init_step, train_state = chkpts.last
                    rng, _ = jax.random.split(rng)
        log.warning(
            f'The {mode} has crashed before all steps were completed'
            f' ({step}/{steps})!'
        )
        raise TrainingCrash(train_state)
    finally:
        if pbar:
            pbar.close()
        if chkpts:
            chkpts.close()
        if metric_logger:
            metric_logger.close()
        if h5_logger:
            h5_logger.close()


def update_progress(pbar, best_ene, ewm_energies, mol_idxs, stats):
    """Refresh the progress bar postfix with EWM energies."""
    means = np.asarray(stats['energy/ewm'])
    errs = np.sqrt(np.asarray(stats['energy/ewm_error']) ** 2)
    for i, mol_idx in enumerate(np.asarray(mol_idxs)):
        ewm_energies[mol_idx] = [
            (float(m), float(s)) for m, s in zip(np.atleast_1d(means[i]), np.atleast_1d(errs[i]))
        ]
    energies = '|'.join(
        '(' + '|'.join(format_uncertainty(m, s) for m, s in em) + ')'
        for em in ewm_energies
    )
    pbar.set_postfix(E=energies)
    improved = best_ene is None or any(
        s < 0.5 * bs
        for em, bem in zip(ewm_energies, best_ene)
        for (_, s), (_, bs) in zip(em, bem)
    )
    if improved:
        best_ene = [list(em) for em in ewm_energies]
        log.info(f'Progress: {pbar.n + 1}/{pbar.total}, energy = {energies}')
    return ewm_energies, best_ene

"""The per-step training loop: ONE fused jitted step.

Reference: /root/reference/src/deepqmc/fit.py.  The reference dispatches at
least four separate pmap programs per step (sample, weight normalization,
optimizer step, sampler refresh; fit.py:46-92) plus one per observable
monitor — each a host-device round trip.  Here sampling, weighting, the
optimizer step (including KFAC curvature updates), and the sampler psi-cache
refresh compile into a single ``jax.jit`` program over the device mesh, with
walkers sharded on the 'data' axis and parameters replicated.
"""

from collections.abc import Generator, Iterable
from typing import Type

import jax
import jax.numpy as jnp

from .ewm import init_multi_mol_multi_state_ewm
from .loss import LossFunctionFactory
from .observable import ObservableMonitor
from .optimizer import NoOptimizer, Optimizer
from .parallel import pexp_normalize_mean, rng_iterator
from .types import Ansatz, KeyArray, Stats, TrainState
from .utils import split_dict

__all__ = ()


def fit_wf(  # noqa: C901
    rng: KeyArray,
    hamil,
    ansatz: Ansatz,
    optimizer_factory: Type[Optimizer],
    molecule_idx_sampler,
    sampler,
    steps: Iterable,
    train_state: TrainState,
    loss_function_factory: LossFunctionFactory,
    observable_monitors: list[ObservableMonitor],
) -> Generator[tuple[int, TrainState, jax.Array, Stats, dict], None, None]:
    loss_fn = loss_function_factory(hamil, ansatz)
    loss_and_grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    opt = optimizer_factory(loss_and_grad_fn)
    if hasattr(opt, 'bind_ansatz'):
        opt.bind_ansatz(ansatz)
    is_evaluation = isinstance(opt, NoOptimizer)

    @jax.jit
    def train_step(rng, data, mol_idxs, train_state: TrainState):
        smpl_state, params, opt_state = train_state
        rng_sample, rng_loss = jax.random.split(rng)
        data = jax.tree_util.tree_map(lambda x: x[mol_idxs], data)
        smpl_state, phys_conf, smpl_stats = sampler.sample(
            rng_sample, smpl_state, params, mol_idxs
        )
        if 'log_weight' in smpl_state['elec']:
            # resampled samplers carry per-walker importance weights
            # (normalized per molecule/state over the walker axis)
            weight = pexp_normalize_mean(
                smpl_state['elec']['log_weight'][mol_idxs], axis=-1
            )
        else:
            weight = jnp.ones(phys_conf.batch_shape)
        params, opt_state, E_loc, ratios, stats = opt.step(
            rng_loss, params, opt_state, (phys_conf, weight, data)
        )
        if not is_evaluation:
            # parameters changed: refresh the sampler's cached psi values
            smpl_state = sampler.update(smpl_state, params)
        return (
            TrainState(smpl_state, params, opt_state),
            phys_conf,
            E_loc,
            ratios,
            {**stats, **smpl_stats},
        )

    smpl_state, params, opt_state = train_state
    n_states = smpl_state['elec']['r'].shape[1]
    ewm_state, update_ewm = init_multi_mol_multi_state_ewm(
        shape=(molecule_idx_sampler.n_mols, n_states)
    )
    std_ewm_state, _ = init_multi_mol_multi_state_ewm(
        shape=(molecule_idx_sampler.n_mols, n_states)
    )
    data = {'energy_ewm': ewm_state.mean, 'std_ewm': std_ewm_state.mean}

    if opt_state is None:
        rng, rng_sample, rng_opt = jax.random.split(rng, 3)
        mol_idxs = molecule_idx_sampler.sample()
        data_it = jax.tree_util.tree_map(lambda x: x[mol_idxs], data)
        _, init_phys_conf, _ = jax.jit(sampler.sample)(
            rng_sample, smpl_state, params, mol_idxs
        )
        opt_state = opt.init(
            rng_opt,
            params,
            (init_phys_conf, jnp.ones(init_phys_conf.batch_shape), data_it),
        )
    train_state = TrainState(smpl_state, params, opt_state)

    for step, rng_step in zip(steps, rng_iterator(rng)):
        mol_idxs = molecule_idx_sampler.sample()
        train_state, phys_conf, E_loc, ratios, stats = train_step(
            rng_step, data, mol_idxs, train_state
        )
        for monitor in observable_monitors:
            stats |= monitor(
                step,
                train_state.params,
                phys_conf,
                train_state.sampler['elec']['psi'],
                E_loc,
                ratios,
            )
        observable_samples, stats = split_dict(stats, lambda k: 'samples' in k)
        stats = jax.device_get(stats)

        ewm_state = update_ewm(
            jnp.asarray(stats['local_energy/mean']), ewm_state, mol_idxs
        )
        std_ewm_state = update_ewm(
            jnp.asarray(stats['local_energy/std']), std_ewm_state, mol_idxs
        )
        data = {'energy_ewm': ewm_state.mean, 'std_ewm': std_ewm_state.mean}
        stats |= {
            'energy/ewm': ewm_state.mean[mol_idxs],
            'energy/ewm_error': jnp.sqrt(ewm_state.sqerr[mol_idxs]),
            'energy/std_ewm': std_ewm_state.mean[mol_idxs],
        }
        yield step, train_state, mol_idxs, stats, observable_samples

"""Excited states: multi-state sampling, overlap penalty, spin penalty."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from deepqmc_tpu.fit import fit_wf
from deepqmc_tpu.loss import (
    create_loss_fn,
    median_log_squeeze_and_mask,
    psi_ratio_clip_and_mask,
)
from deepqmc_tpu.observable import default_observable_monitors
from deepqmc_tpu.optimizer import OptaxOptimizer
from deepqmc_tpu.presets import ansatz_preset
from deepqmc_tpu.sampling import (
    DecorrSampler,
    MetropolisSampler,
    combine_samplers,
    initialize_sampler_state,
    initialize_sampling,
)
from deepqmc_tpu.types import TrainState
from deepqmc_tpu.wf import init_wf_params, instantiate_ansatz


@pytest.fixture(scope='module')
def excited_setup(helpers):
    hamil = helpers.hamil(mol=helpers.mol('H2'))
    ansatz = instantiate_ansatz(
        hamil,
        ansatz_preset(
            'default', n_determinants=2, embedding_dim=16, n_interactions=1,
            two_particle_stream_dim=8,
        ),
    )
    mols = [hamil.mol]
    mol_idx_sampler, sampler = initialize_sampling(
        helpers.rng(0), hamil, ansatz, mols, 2, 1,
        elec_sampler=partial(
            combine_samplers,
            [DecorrSampler(length=2), partial(MetropolisSampler, tau=1.0)],
        ),
    )
    params = init_wf_params(helpers.rng(1), hamil, ansatz, 2)
    smpl_state = initialize_sampler_state(helpers.rng(2), sampler, params, 32, mols)
    return hamil, ansatz, mol_idx_sampler, sampler, params, smpl_state


@pytest.mark.heavy
def test_two_state_training_with_overlap_penalty(excited_setup):
    hamil, ansatz, mol_idx_sampler, sampler, params, smpl_state = excited_setup
    assert jax.tree_util.tree_leaves(params)[0].shape[0] == 2  # state axis
    loss_factory = partial(
        create_loss_fn,
        clip_mask_fn=median_log_squeeze_and_mask,
        clip_mask_overlap_fn=partial(psi_ratio_clip_and_mask),
        alpha=1.0,
        scale_overlap_by='max_gap_std',
        sort_states_by='energy',
    )
    stats_seen = []
    for step, ts, mol_idxs, stats, obs in fit_wf(
        jax.random.PRNGKey(3),
        hamil,
        ansatz,
        partial(OptaxOptimizer, optax_opt=optax.adam(3e-3)),
        mol_idx_sampler,
        sampler,
        range(6),
        TrainState(smpl_state, params, None),
        loss_factory,
        [m.finalize(hamil, ansatz.apply) for m in default_observable_monitors()],
    ):
        stats_seen.append(stats)
    final = stats_seen[-1]
    # per-state energies and pairwise overlap stats are produced
    assert np.asarray(final['local_energy/mean']).shape == (1, 2)
    assert np.isfinite(np.asarray(final['local_energy/mean'])).all()
    overlap = np.asarray(final['overlap/pairwise/mean'])
    assert overlap.shape == (1, 2, 2)
    assert np.allclose(np.diagonal(overlap, axis1=1, axis2=2), 1.0, atol=1e-6)


@pytest.mark.heavy
def test_spin_penalty_loss(excited_setup, helpers):
    hamil, ansatz, mol_idx_sampler, sampler, params, smpl_state = excited_setup
    loss_factory = partial(
        create_loss_fn,
        clip_mask_fn=median_log_squeeze_and_mask,
        clip_mask_overlap_fn=partial(psi_ratio_clip_and_mask),
        alpha=1.0,
        spin_penalty=1.0,
    )
    for step, ts, mol_idxs, stats, obs in fit_wf(
        jax.random.PRNGKey(5),
        hamil,
        ansatz,
        partial(OptaxOptimizer, optax_opt=optax.adam(1e-3)),
        mol_idx_sampler,
        sampler,
        range(2),
        TrainState(smpl_state, params, None),
        loss_factory,
        [m.finalize(hamil, ansatz.apply) for m in default_observable_monitors()],
    ):
        pass
    spin = np.asarray(stats['spin/mean'])
    assert spin.shape == (1, 2)
    assert np.isfinite(spin).all()
    # H2 singlet ground state: <S^2> should be small-ish but finite
    assert (np.abs(spin) < 3.0).all()

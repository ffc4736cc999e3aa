import os
from functools import partial

import jax
import numpy as np
import optax
import pytest

from deepqmc_tpu.optimizer import NoOptimizer, OptaxOptimizer
from deepqmc_tpu.presets import ansatz_preset
from deepqmc_tpu.sampling import (
    DecorrSampler,
    MetropolisSampler,
    combine_samplers,
    initialize_sampling,
)
from deepqmc_tpu.train import train
from deepqmc_tpu.types import TrainState
from deepqmc_tpu.wf import instantiate_ansatz


def make_sampler_factory(length=3, tau=1.0):
    return partial(
        initialize_sampling,
        elec_sampler=partial(
            combine_samplers,
            [DecorrSampler(length=length), partial(MetropolisSampler, tau=tau)],
        ),
    )


@pytest.fixture(scope='module')
def h2_setup(helpers):
    hamil = helpers.hamil(mol=helpers.mol('H2'))
    ansatz = instantiate_ansatz(
        hamil,
        ansatz_preset(
            'default',
            n_determinants=2,
            embedding_dim=16,
            n_interactions=1,
            two_particle_stream_dim=8,
        ),
    )
    return hamil, ansatz


@pytest.mark.heavy
def test_train_h2_smoke(h2_setup, tmp_path):
    """Minimum end-to-end slice: H2, 64 walkers, Adam, few steps + workdir."""
    hamil, ansatz = h2_setup
    train_state = train(
        hamil,
        ansatz,
        partial(OptaxOptimizer, optax_opt=optax.adam(1e-2)),
        make_sampler_factory(),
        steps=8,
        seed=0,
        electron_batch_size=64,
        workdir=str(tmp_path),
        max_eq_steps=12,
        pretrain_steps=None,
    )
    assert isinstance(train_state, TrainState)
    # artifacts
    files = os.listdir(tmp_path / 'training')
    assert 'result.h5' in files
    assert any(f.startswith('chkpt-') for f in files)
    assert any('tfevents' in f for f in files)
    # recorded energies are finite
    import h5py

    with h5py.File(tmp_path / 'training' / 'result.h5', 'r') as f:
        energies = f['local_energy/mean'][...]
        assert energies.shape[0] == 8
        assert np.isfinite(energies).all()


@pytest.mark.heavy
def test_train_h2_energy_improves(h2_setup):
    """A short optimization must lower the H2 energy toward -1.17 Ha."""
    hamil, ansatz = h2_setup
    energies = []

    class Recorder(NoOptimizer):
        pass

    from deepqmc_tpu import fit as fit_mod

    # run the real train loop and capture stats via observable monitors
    from deepqmc_tpu.fit import fit_wf
    from deepqmc_tpu.loss import create_loss_fn, median_log_squeeze_and_mask
    from deepqmc_tpu.observable import default_observable_monitors
    from deepqmc_tpu.sampling import initialize_sampler_state

    rng = jax.random.PRNGKey(0)
    mols = [hamil.mol]
    mol_idx_sampler, sampler = make_sampler_factory()(
        rng, hamil, ansatz, mols, 1, 1
    )
    from deepqmc_tpu.wf import init_wf_params

    params = init_wf_params(jax.random.PRNGKey(1), hamil, ansatz, 1)
    smpl_state = initialize_sampler_state(
        jax.random.PRNGKey(2), sampler, params, 128, mols
    )
    for step, ts, mol_idxs, stats, _obs in fit_wf(
        jax.random.PRNGKey(3),
        hamil,
        ansatz,
        partial(OptaxOptimizer, optax_opt=optax.adam(5e-3)),
        mol_idx_sampler,
        sampler,
        range(60),
        TrainState(smpl_state, params, None),
        partial(create_loss_fn, clip_mask_fn=median_log_squeeze_and_mask),
        [m.finalize(hamil, ansatz.apply) for m in default_observable_monitors()],
    ):
        energies.append(float(np.asarray(stats['local_energy/mean']).reshape(-1)[0]))
    energies = np.array(energies)
    assert np.isfinite(energies).all()
    # energy must drop substantially from the random-init value and be in a
    # physically sensible window (H2 ground state is -1.174 Ha)
    assert energies[-10:].mean() < energies[:5].mean() - 0.05
    assert energies[-10:].mean() < -0.7
    assert energies[-10:].mean() > -1.5


@pytest.mark.heavy
def test_evaluation_mode(h2_setup):
    hamil, ansatz = h2_setup
    train_state = train(
        hamil,
        ansatz,
        None,  # evaluation
        make_sampler_factory(),
        steps=3,
        seed=0,
        electron_batch_size=32,
        max_eq_steps=5,
    )
    assert train_state.opt is None


@pytest.mark.heavy
def test_block_scanned_training(h2_setup, helpers):
    """block_size > 1 scans steps inside one jit and yields identical API."""
    from deepqmc_tpu.fit import fit_wf
    from deepqmc_tpu.loss import create_loss_fn, median_log_squeeze_and_mask
    from deepqmc_tpu.observable import default_observable_monitors
    from deepqmc_tpu.sampling import initialize_sampler_state
    from deepqmc_tpu.wf import init_wf_params

    hamil, ansatz = h2_setup
    mols = [hamil.mol]
    mol_idx_sampler, sampler = make_sampler_factory()(
        helpers.rng(0), hamil, ansatz, mols, 1, 1
    )
    params = init_wf_params(helpers.rng(1), hamil, ansatz, 1)
    smpl_state = initialize_sampler_state(
        helpers.rng(2), sampler, params, 64, mols
    )
    seen = []
    for step, ts, mol_idxs, stats, obs in fit_wf(
        helpers.rng(3),
        hamil,
        ansatz,
        partial(OptaxOptimizer, optax_opt=optax.adam(5e-3)),
        mol_idx_sampler,
        sampler,
        range(7),  # not a multiple of the block size
        TrainState(smpl_state, params, None),
        partial(create_loss_fn, clip_mask_fn=median_log_squeeze_and_mask),
        [m.finalize(hamil, ansatz.apply) for m in default_observable_monitors()],
        block_size=3,
    ):
        seen.append(step)
        assert np.isfinite(np.asarray(stats['local_energy/mean'])).all()
        assert np.isfinite(np.asarray(obs['psi/samples']['log'])).all()
        assert np.isfinite(np.asarray(stats['energy/ewm'])).any() or step == 0
    assert seen == list(range(7))

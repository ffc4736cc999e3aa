from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepqmc_tpu.physics import pairwise_self_distance
from deepqmc_tpu.sampling import (
    DecorrSampler,
    LangevinSampler,
    MetropolisSampler,
    MoleculeIdxSampler,
    ResampledSampler,
    chain,
    combine_samplers,
    equilibrate,
    initialize_sampler_state,
    initialize_sampling,
)
from deepqmc_tpu.types import Psi


def gaussian_wf(alpha=0.5):
    """Analytically known density ~ exp(-alpha * sum r^2)."""

    def wf(params, phys_conf):
        return Psi(jnp.array(1.0), -0.5 * alpha * (phys_conf.r**2).sum())

    return wf


@pytest.fixture(scope='module')
def setup(helpers):
    hamil = helpers.hamil(mol=helpers.mol('H2'))
    return hamil, gaussian_wf()


SAMPLER_FACTORIES = {
    'metropolis': lambda: [partial(MetropolisSampler, tau=0.5)],
    'langevin': lambda: [partial(LangevinSampler, tau=0.2)],
    'decorr_metropolis': lambda: [
        DecorrSampler(length=4),
        partial(MetropolisSampler, tau=0.5),
    ],
    'resampled_decorr_metropolis': lambda: [
        ResampledSampler(period=3),
        DecorrSampler(length=4),
        partial(MetropolisSampler, tau=0.5),
    ],
}


@pytest.mark.parametrize('name', list(SAMPLER_FACTORIES))
def test_sampler_init_and_steps(setup, helpers, name):
    hamil, wf = setup
    sampler = combine_samplers(SAMPLER_FACTORIES[name](), hamil, wf)
    state = sampler.init(helpers.rng(0), {}, 32, hamil.mol.coords)
    assert state['r'].shape == (32, 2, 3)
    assert np.isfinite(np.asarray(state['psi'].log)).all()
    rngs = jax.random.split(helpers.rng(1), 4)
    for rng in rngs:
        state, phys_conf, stats = jax.jit(sampler.sample)(rng, state, {}, hamil.mol.coords)
    assert phys_conf.r.shape == (32, 2, 3)
    assert 0 < float(stats['sampling/acceptance']) <= 1.0
    assert np.isfinite(np.asarray(state['r'])).all()


def test_metropolis_samples_correct_density(setup, helpers):
    """Long MH chain must reproduce the variance of the target Gaussian."""
    hamil, _ = setup
    alpha = 0.5
    sampler = chain(
        DecorrSampler(length=10),
        MetropolisSampler(hamil, gaussian_wf(alpha), tau=1.0),
    )
    state = sampler.init(helpers.rng(0), {}, 512, hamil.mol.coords)
    step = jax.jit(sampler.sample)
    for i, rng in enumerate(jax.random.split(helpers.rng(1), 60)):
        state, phys_conf, stats = step(rng, state, {}, hamil.mol.coords)
    # target: independent normal with var = 1/(2 alpha) per coordinate
    samples = np.asarray(phys_conf.r).reshape(-1)
    assert samples.var() == pytest.approx(1 / (2 * alpha), rel=0.1)
    assert abs(samples.mean()) < 0.05


def test_langevin_matches_metropolis_density(setup, helpers):
    hamil, _ = setup
    alpha = 0.5
    sampler = chain(
        DecorrSampler(length=10),
        LangevinSampler(hamil, gaussian_wf(alpha), tau=0.5),
    )
    state = sampler.init(helpers.rng(3), {}, 512, hamil.mol.coords)
    step = jax.jit(sampler.sample)
    for rng in jax.random.split(helpers.rng(4), 60):
        state, phys_conf, _ = step(rng, state, {}, hamil.mol.coords)
    samples = np.asarray(phys_conf.r).reshape(-1)
    assert samples.var() == pytest.approx(1 / (2 * alpha), rel=0.1)


def test_tau_adapts_toward_target_acceptance(setup, helpers):
    hamil, wf = setup
    sampler = MetropolisSampler(hamil, wf, tau=10.0, target_acceptance=0.57)
    state = sampler.init(helpers.rng(0), {}, 256, hamil.mol.coords)
    step = jax.jit(sampler.sample)
    for rng in jax.random.split(helpers.rng(1), 80):
        state, _, stats = step(rng, state, {}, hamil.mol.coords)
    assert float(stats['sampling/acceptance']) == pytest.approx(0.57, abs=0.12)
    assert float(state['tau']) < 10.0


def test_resampling_resets_weights(setup, helpers):
    hamil, wf = setup
    sampler = chain(
        ResampledSampler(period=2),
        DecorrSampler(length=2),
        MetropolisSampler(hamil, wf, tau=0.5),
    )
    state = sampler.init(helpers.rng(0), {}, 16, hamil.mol.coords)
    assert 'log_weight' in state and 'step' in state
    # pretend the wave function changed: update adjusts weights
    state_upd = sampler.update(state, {}, hamil.mol.coords)
    assert np.allclose(state_upd['log_weight'], state['log_weight'])  # same wf
    step = jax.jit(sampler.sample)
    for rng in jax.random.split(helpers.rng(2), 2):
        state, _, stats = step(rng, state, {}, hamil.mol.coords)
    # after hitting the period the step counter is reset
    assert int(state['step']) == 0


def test_molecule_idx_sampler_roundrobin(helpers):
    s = MoleculeIdxSampler(helpers.rng(0), 3, 2, False)
    batches = [np.asarray(s.sample()) for _ in range(3)]
    seen = np.concatenate(batches)
    assert len(seen) == 6
    assert set(seen) == {0, 1, 2}


def test_full_sampling_stack(setup, helpers):
    hamil, wf = setup

    class _Ansatz:
        apply = staticmethod(wf)

    mols = [hamil.mol]
    mol_idx_sampler, sampler = initialize_sampling(
        helpers.rng(0),
        hamil,
        _Ansatz(),
        mols,
        electronic_states=2,
        molecule_batch_size=1,
        elec_sampler=lambda hamil, wf: chain(
            DecorrSampler(length=2), MetropolisSampler(hamil, wf, tau=0.5)
        ),
    )
    state = initialize_sampler_state(helpers.rng(1), sampler, {}, 16, mols)
    assert state['elec']['r'].shape == (1, 2, 16, 2, 3)
    mol_idxs = mol_idx_sampler.sample()
    state, phys_conf, stats = jax.jit(sampler.sample)(
        helpers.rng(2), state, {}, mol_idxs
    )
    assert phys_conf.r.shape == (1, 2, 16, 2, 3)
    assert phys_conf.mol_idx.shape == (1, 2, 16)
    # equilibrate generator with early stopping
    crit = lambda pc: jnp.mean(pairwise_self_distance(pc.r))
    steps = iter(range(100))
    n_steps = 0
    for _step, state, _idxs, _stats in equilibrate(
        helpers.rng(3),
        {},
        mol_idx_sampler,
        sampler,
        state,
        crit,
        steps,
        block_size=5,
    ):
        n_steps += 1
    assert 0 < n_steps <= 100


def test_equilibrate_waits_for_psi_spread_stabilization():
    """Early stopping must be vetoed while the walker log|psi| spread is
    still drifting, even when the geometric criterion has stabilized —
    regression for the fat low-|psi|-tail evaluation artifact
    (docs/evidence/accuracy_notes.md)."""
    import jax.numpy as jnp

    from deepqmc_tpu.sampling.sampling_utils import equilibrate

    class StubIdxSampler:
        def sample(self):
            return jnp.array([0])

    class StubSampler:
        """Criterion series: stationary noise.  log|psi| std: configurable."""

        def __init__(self, drift):
            self.drift = drift

        def sample(self, rng, state, params, mol_idxs):
            i = state['i']
            noise = 1e-3 * jnp.sin(12.9898 * i)
            spread = 0.1 * i if self.drift else 1.0 + noise
            return (
                {'i': i + 1},
                i.astype(float) + noise,  # "phys_conf" consumed by criterion
                {'sampling/log_psi/std': spread},
            )

    def run(drift, max_steps=60):
        n = 0
        for n, (step, *_rest) in enumerate(
            equilibrate(
                jax.random.PRNGKey(0),
                {},
                StubIdxSampler(),
                StubSampler(drift),
                {'i': jnp.array(0)},
                lambda i: 1e-3 * jnp.sin(78.233 * i),  # stationary
                range(max_steps),
                block_size=2,
                n_blocks=5,
            ),
            1,
        ):
            pass
        return n

    window = 2 * 5
    assert run(drift=False) < 25  # stationary psi spread -> early stop
    assert run(drift=True) == 60  # drifting psi spread -> veto, run out

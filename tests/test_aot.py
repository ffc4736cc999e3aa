"""AOT executable cache (deepqmc_tpu/aot.py).

The cache must (a) round-trip a compiled executable with its static
metadata, (b) key on everything that determines the traced program, and
(c) plug into fit_wf so a warm start reproduces the cold run bit-for-bit.
"""

import logging

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepqmc_tpu.aot import AotCache


@pytest.fixture()
def cache_dir(tmp_path, monkeypatch):
    monkeypatch.setenv('DEEPQMC_TPU_AOT_DIR', str(tmp_path))
    return tmp_path


def _compiled(fn, *args):
    return jax.jit(fn).lower(*args).compile()


def test_roundtrip_with_meta(cache_dir):
    args = ({'x': jnp.arange(4.0), 'y': jnp.ones((2, 3))},)
    cache = AotCache('unit', {'knob': 1})
    assert cache.load(*args) is None
    fn = lambda d: {'out': (d['x'] ** 2).sum() + d['y'].sum()}
    compiled = _compiled(fn, *args)
    cache.save(compiled, {'layout': [('k', (2,))]}, *args)
    assert len(list(cache_dir.glob('unit-*.aot'))) == 1
    loaded, meta = cache.load(*args)
    assert meta == {'layout': [('k', (2,))]}
    np.testing.assert_allclose(loaded(*args)['out'], fn(*args)['out'])


def test_key_sensitivity(cache_dir, monkeypatch):
    args = (jnp.arange(4.0),)
    compiled = _compiled(lambda x: x.sum(), *args)
    AotCache('unit', {'knob': 1}).save(compiled, None, *args)
    # a different program description must miss
    assert AotCache('unit', {'knob': 2}).load(*args) is None
    # different input avals must miss
    assert AotCache('unit', {'knob': 1}).load(jnp.arange(5.0)) is None
    assert AotCache('unit', {'knob': 1}).load(jnp.arange(4, dtype=jnp.int32)) is None
    # DEEPQMC_TPU_* env vars gate kernel variants -> part of the key
    monkeypatch.setenv('DEEPQMC_TPU_JAC_DTYPE', 'f32')
    assert AotCache('unit', {'knob': 1}).load(*args) is None
    monkeypatch.delenv('DEEPQMC_TPU_JAC_DTYPE')
    assert AotCache('unit', {'knob': 1}).load(*args) is not None


def test_disabled_by_empty_env(tmp_path, monkeypatch):
    monkeypatch.setenv('DEEPQMC_TPU_AOT_DIR', '')
    cache = AotCache('unit', {})
    assert not cache.enabled
    args = (jnp.arange(4.0),)
    cache.save(_compiled(lambda x: x.sum(), *args), None, *args)
    assert cache.load(*args) is None


def test_corrupt_entry_falls_back(cache_dir):
    args = (jnp.arange(4.0),)
    cache = AotCache('unit', {})
    cache.save(_compiled(lambda x: x.sum(), *args), None, *args)
    (entry,) = cache_dir.glob('unit-*.aot')
    entry.write_bytes(b'not a pickle')
    assert cache.load(*args) is None  # warns, never raises


def _tiny_fit(helpers, aot_cache, n_steps=4):
    import optax

    from deepqmc_tpu.fit import fit_wf
    from deepqmc_tpu.loss import create_loss_fn, median_log_squeeze_and_mask
    from deepqmc_tpu.optimizer import OptaxOptimizer
    from deepqmc_tpu.presets import ansatz_preset
    from deepqmc_tpu.sampling import (
        MetropolisSampler,
        combine_samplers,
        initialize_sampler_state,
        initialize_sampling,
    )
    from deepqmc_tpu.types import TrainState
    from deepqmc_tpu.wf import init_wf_params, instantiate_ansatz
    from functools import partial

    hamil = helpers.hamil(mol=helpers.mol('H2'))
    ansatz = instantiate_ansatz(
        hamil,
        ansatz_preset(
            'default',
            n_determinants=1,
            embedding_dim=8,
            n_interactions=1,
            two_particle_stream_dim=4,
        ),
    )
    mols = [hamil.mol]
    mol_idx_sampler, sampler = initialize_sampling(
        helpers.rng(0),
        hamil,
        ansatz,
        mols,
        electronic_states=1,
        molecule_batch_size=1,
        elec_sampler=partial(
            combine_samplers, [partial(MetropolisSampler, tau=1.0)]
        ),
    )
    params = init_wf_params(helpers.rng(1), hamil, ansatz, 1)
    smpl_state = initialize_sampler_state(
        helpers.rng(2), sampler, params, 8, mols
    )
    energies = []
    for _step, ts, _mol_idxs, stats, _obs in fit_wf(
        helpers.rng(3),
        hamil,
        ansatz,
        partial(OptaxOptimizer, optax_opt=optax.adam(1e-3)),
        mol_idx_sampler,
        sampler,
        range(n_steps),
        TrainState(smpl_state, params, None),
        partial(create_loss_fn, clip_mask_fn=median_log_squeeze_and_mask),
        [],
        block_size=2,
        aot_cache=aot_cache,
    ):
        energies.append(float(np.asarray(stats['local_energy/mean'])))
    return energies


def test_fit_wf_warm_start_reproduces_cold_run(helpers, cache_dir, caplog):
    """Warm start through the cache must reproduce the cold run exactly.

    On XLA:CPU the deserialized fit-block executable is known to defer-fail
    at execution (a fusion symbol goes missing); the probe-execution in
    ``AotCache.load`` must catch that and fall back to trace+compile, so
    the warm run still succeeds either way — via the cache on platforms
    where AOT loading works (verified on TPU hardware), via fallback here.
    """
    cache = AotCache('fit_test', {'cfg': 'tiny-h2'})
    cold = _tiny_fit(helpers, cache)
    assert len(list(cache_dir.glob('fit_test-*.aot'))) == 1
    with caplog.at_level(logging.INFO, logger='deepqmc_tpu.aot'):
        warm = _tiny_fit(helpers, AotCache('fit_test', {'cfg': 'tiny-h2'}))
    assert any(
        'AOT cache hit' in r.message or 'unusable' in r.message
        for r in caplog.records
    )
    # same program either way: identical trajectories
    np.testing.assert_allclose(cold, warm, rtol=1e-12)

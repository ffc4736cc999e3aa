"""The direct VMC gradient estimator (loss/loss_function.py).

The estimator gradient g must satisfy <g, dtheta> = assemble_tangent(T) for
every parameter direction dtheta, where T is the JVP of batched log|psi| in
that direction — i.e. the vjp/linear_transpose path must agree with the
custom-JVP formulation the reference uses (loss_function.py:171-244 there).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepqmc_tpu.loss import (
    create_loss_fn,
    median_log_squeeze_and_mask,
    psi_ratio_clip_and_mask,
)
from deepqmc_tpu.loss.clip import clip_local_energy, clip_psi_ratio
from deepqmc_tpu.loss.energy import (
    compute_local_energy,
    compute_mean_energy_tangent,
)
from deepqmc_tpu.loss.loss_function import _batched_log_psi, _state_phys_conf
from deepqmc_tpu.loss.overlap import OverlapPenalty
from deepqmc_tpu.loss.spin import (
    compute_mean_spin_tangent,
    compute_spin_contributions,
)
from deepqmc_tpu.presets import ansatz_preset
from deepqmc_tpu.utils import tree_stack
from deepqmc_tpu.wf import init_wf_params, instantiate_ansatz


@pytest.fixture(scope='module')
def loss_setup(helpers):
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
    n_states, n_walkers = 2, 8
    params = jax.device_get(init_wf_params(helpers.rng(1), hamil, ansatz, n_states))
    params = [
        jax.tree_util.tree_map(lambda x, i=i: jnp.asarray(x[i]), params)
        for i in range(n_states)
    ]
    confs = [
        hamil.init_sample(helpers.rng(10 + i), hamil.mol.coords, n_walkers)
        for i in range(n_states)
    ]
    phys_conf = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, axis=0)[None], *confs
    )  # [mol=1, state, walker]
    weight = jnp.ones(phys_conf.batch_shape)
    return hamil, ansatz, params, phys_conf, weight


def log_psi_tangent_of(ansatz, phys_conf, params, dparams):
    """T[mol, state, walker]: JVP of each state's batched log psi."""
    tangents = []
    for i, (p, dp) in enumerate(zip(params, dparams)):
        conf = _state_phys_conf(phys_conf, i)
        _, t = jax.jvp(partial(_batched_log_psi, ansatz, conf), (p,), (dp,))
        tangents.append(t.reshape(phys_conf.batch_shape[::2]))
    return jnp.stack(tangents, axis=1)


@pytest.mark.parametrize('with_spin', [False, True])
@pytest.mark.heavy
def test_direct_gradient_matches_tangent(loss_setup, helpers, with_spin):
    hamil, ansatz, params, phys_conf, weight = loss_setup
    loss_fn = create_loss_fn(
        hamil,
        ansatz,
        clip_mask_fn=median_log_squeeze_and_mask,
        clip_mask_overlap_fn=psi_ratio_clip_and_mask,
        alpha=1.0,
        spin_penalty=0.5 if with_spin else None,
        scale_overlap_by='max_gap_std',
        sort_states_by='energy',
    )
    data = {
        'energy_ewm': jnp.array([[-1.0, -0.6]]),
        'std_ewm': jnp.array([[0.2, 0.3]]),
    }
    batch = (phys_conf, weight, data)
    rng = helpers.rng(7)
    (loss, (E_loc, ratios, stats)), grads = loss_fn.value_and_grad(
        params, rng, batch
    )
    assert np.isfinite(loss)
    assert np.isfinite(helpers.flatten_pytree(grads)).all()

    # oracle: rebuild the tangent from the published term functions
    stacked = tree_stack(params)
    local_energy, _ = compute_local_energy(
        rng, hamil, ansatz.apply, stacked, phys_conf
    )
    np.testing.assert_allclose(np.asarray(E_loc), np.asarray(local_energy))
    clipped_E, mask = clip_local_energy(median_log_squeeze_and_mask, local_energy)
    penalty = loss_fn.overlap_penalty
    psi_ratio = penalty.ratios(ansatz, stacked, phys_conf)
    clipped_ratio, ratio_mask = clip_psi_ratio(psi_ratio_clip_and_mask, psi_ratio)
    overlap_data = dict(data, ordering=jnp.argsort(data['energy_ewm'], axis=-1))
    if with_spin:
        spin_contributions = compute_spin_contributions(
            hamil, ansatz, stacked, phys_conf
        )

    def tangent_from(T):
        t = compute_mean_energy_tangent(clipped_E, weight, T, mask)
        t += penalty.tangent(clipped_ratio, weight, T, ratio_mask, overlap_data)
        if with_spin:
            t += 0.5 * compute_mean_spin_tangent(
                spin_contributions, weight, T, mask
            )
        return t

    for seed in range(3):
        dparams = jax.tree_util.tree_map(
            lambda x: jax.random.normal(
                jax.random.fold_in(helpers.rng(seed), hash(str(x.shape)) % 1000),
                x.shape,
                x.dtype,
            ),
            params,
        )
        T = log_psi_tangent_of(ansatz, phys_conf, params, dparams)
        expected = tangent_from(T)
        actual = sum(
            jnp.vdot(helpers.flatten_pytree(g), helpers.flatten_pytree(dp))
            for g, dp in zip(grads, dparams)
        )
        np.testing.assert_allclose(
            np.asarray(actual), np.asarray(expected), rtol=1e-9, atol=1e-12
        )


@pytest.mark.heavy
def test_forward_only_call_matches_value_and_grad(loss_setup, helpers):
    hamil, ansatz, params, phys_conf, weight = loss_setup
    loss_fn = create_loss_fn(
        hamil,
        ansatz,
        clip_mask_fn=median_log_squeeze_and_mask,
        clip_mask_overlap_fn=psi_ratio_clip_and_mask,
        alpha=1.0,
    )
    data = {
        'energy_ewm': jnp.array([[-1.0, -0.6]]),
        'std_ewm': jnp.array([[0.2, 0.3]]),
    }
    batch = (phys_conf, weight, data)
    loss, (E_loc, ratios, stats) = loss_fn(params, helpers.rng(7), batch)
    (loss2, (E_loc2, *_)), _ = loss_fn.value_and_grad(params, helpers.rng(7), batch)
    np.testing.assert_allclose(np.asarray(loss), np.asarray(loss2))
    np.testing.assert_allclose(np.asarray(E_loc), np.asarray(E_loc2))


def test_chunked_pullback_matches_whole_batch(loss_setup, helpers, monkeypatch):
    """DEEPQMC_TPU_GRAD_WALKER_CHUNK sequentializes the log-psi vjp without
    changing the gradient (chunk 3 does not divide 8, so the chunker falls
    back to the largest divisor); with the KFAC factor-sum reducer the
    chunk-accumulated Kronecker factor sums must also match the whole-batch
    pass."""
    from deepqmc_tpu.kfac import KFAC
    from deepqmc_tpu.kfac.kfac import factor_sums
    from deepqmc_tpu.utils import ConstantSchedule

    hamil, ansatz, params, phys_conf, weight = loss_setup
    loss_fn = create_loss_fn(
        hamil,
        ansatz,
        clip_mask_fn=median_log_squeeze_and_mask,
        clip_mask_overlap_fn=psi_ratio_clip_and_mask,
        alpha=1.0,
    )
    data = {
        'energy_ewm': jnp.array([[-1.0, -0.6]]),
        'std_ewm': jnp.array([[0.2, 0.3]]),
    }
    batch = (phys_conf, weight, data)
    rng = helpers.rng(7)
    (loss_w, _), grads_whole = loss_fn.value_and_grad(params, rng, batch)

    # layer metadata for the taps path, exactly as KFAC.step builds it
    kfac = KFAC(loss_fn.value_and_grad, learning_rate_schedule=ConstantSchedule(1.0))
    kfac.bind_ansatz(ansatz)
    single_pc = jax.tree_util.tree_map(
        lambda x: x.reshape(-1, *x.shape[3:])[0], phys_conf
    )
    metas = kfac._discover_layers(params[0], single_pc)
    taps_spec = {m.path: list(m.out_shapes) for m in metas}
    reducer = partial(factor_sums, metas)
    (_, _), grads_taps_whole, sums_whole = loss_fn.value_grad_and_taps(
        params, rng, batch, taps_spec, reducer
    )

    monkeypatch.setenv('DEEPQMC_TPU_GRAD_WALKER_CHUNK', '3')
    (loss_c, _), grads_chunked = loss_fn.value_and_grad(params, rng, batch)
    (_, _), grads_taps_chunked, sums_chunked = loss_fn.value_grad_and_taps(
        params, rng, batch, taps_spec, reducer
    )

    np.testing.assert_allclose(np.asarray(loss_c), np.asarray(loss_w))
    for whole, chunked in (
        (grads_whole, grads_chunked),
        (grads_taps_whole, grads_taps_chunked),
        (sums_whole, sums_chunked),
    ):
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-8, atol=1e-10
            ),
            whole,
            chunked,
        )


def test_chunked_eloc_matches_whole_batch(loss_setup, helpers, monkeypatch):
    """DEEPQMC_TPU_ELOC_WALKER_CHUNK sequentializes the walker axis without
    changing the local energies (chunk 3 does not divide 8, so the chunker
    must fall back to the largest divisor)."""
    hamil, ansatz, params, phys_conf, _ = loss_setup
    stacked = tree_stack(params)
    rng = helpers.rng(7)
    whole, _ = compute_local_energy(rng, hamil, ansatz.apply, stacked, phys_conf)
    monkeypatch.setenv('DEEPQMC_TPU_ELOC_WALKER_CHUNK', '3')
    chunked, _ = compute_local_energy(
        rng, hamil, ansatz.apply, stacked, phys_conf
    )
    np.testing.assert_allclose(
        np.asarray(chunked), np.asarray(whole), rtol=1e-6, atol=1e-8
    )

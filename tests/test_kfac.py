from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepqmc_tpu import nn
from deepqmc_tpu.kfac import KFAC
from deepqmc_tpu.types import PhysicalConfiguration, Psi
from deepqmc_tpu.utils import ConstantSchedule


def make_linear_ansatz():
    """logpsi = w . r_flat (single dense layer, no bias)."""

    def f(phys_conf, return_mos=False):
        x = phys_conf.r.reshape(-1)
        out = nn.Linear(1, with_bias=False, name='lin')(x)
        return Psi(jnp.array(1.0), out.squeeze())

    return nn.transform(f)


def make_batch(rng, n=512):
    r = jax.random.normal(rng, (1, 1, n, 2, 3))
    R = jnp.zeros((1, 1, n, 1, 3))
    mol_idx = jnp.zeros((1, 1, n), dtype=jnp.int32)
    pc = PhysicalConfiguration(R, r, mol_idx)
    return (pc, jnp.ones((1, 1, n)), {})


def test_kfac_single_dense_layer_matches_exact_fisher(helpers):
    """For one dense layer the Kronecker factorization is exact; with tiny
    damping the KFAC update must match the exact natural gradient."""
    ansatz = make_linear_ansatz()
    batch = make_batch(helpers.rng(0))
    pc = batch[0]
    params = ansatz.init(helpers.rng(1), pc[0, 0, 0])

    # an arbitrary smooth loss of the params through logpsi
    def loss_fn(params_list, rng, batch):
        pc, weight, data = batch
        logs = jax.vmap(
            lambda p: ansatz.apply(params_list[0], p).log
        )(jax.tree_util.tree_map(lambda x: x[0, 0], pc))
        loss = jnp.mean((logs - 1.0) ** 2)
        return loss, (logs, None, {})

    loss_and_grad = jax.value_and_grad(loss_fn, has_aux=True)
    kfac = KFAC(
        loss_and_grad,
        learning_rate_schedule=ConstantSchedule(1.0),
        damping_schedule=ConstantSchedule(1e-9),
        norm_constraint=1e12,  # disable trust region for the comparison
        curvature_ema=0.0,  # use the current-batch factors exactly
    )
    kfac.bind_ansatz(ansatz)
    state = kfac.init(helpers.rng(2), [params], batch)
    new_params, state, aux, stats = kfac.step(helpers.rng(3), [params], state, batch)

    # exact natural gradient: F = E[x x^T] (sensitivities are 1)
    x = np.asarray(batch[0].r[0, 0].reshape(512, -1))
    F = x.T @ x / len(x)
    (_, (_, _, _)), grads = loss_and_grad([params], None, batch)
    g = np.asarray(grads[0]['lin']['w'])
    v_exact = np.linalg.solve(F + 1e-9 * np.eye(6), g)
    v_kfac = (np.asarray(params['lin']['w']) - np.asarray(new_params[0]['lin']['w']))
    assert np.allclose(v_kfac, v_exact, rtol=1e-3, atol=1e-8)


def test_kfac_norm_constraint_limits_update(helpers):
    ansatz = make_linear_ansatz()
    batch = make_batch(helpers.rng(0))
    params = ansatz.init(helpers.rng(1), batch[0][0, 0, 0])

    def loss_fn(params_list, rng, batch):
        pc, *_ = batch
        logs = jax.vmap(lambda p: ansatz.apply(params_list[0], p).log)(
            jax.tree_util.tree_map(lambda x: x[0, 0], pc)
        )
        return jnp.mean((logs - 100.0) ** 2), (logs, None, {})

    kfac = KFAC(
        jax.value_and_grad(loss_fn, has_aux=True),
        learning_rate_schedule=ConstantSchedule(1.0),
        damping_schedule=ConstantSchedule(1e-3),
        norm_constraint=1e-3,
    )
    kfac.bind_ansatz(ansatz)
    state = kfac.init(helpers.rng(2), [params], batch)
    _, _, _, stats = kfac.step(helpers.rng(3), [params], state, batch)
    assert float(stats['opt/norm_scale']) < 1.0
    # lr^2 * v.g after scaling is exactly the norm constraint
    assert float(
        (stats['opt/lr']) ** 2 * stats['opt/v_dot_g']
    ) == pytest.approx(1e-3, rel=1e-4)


@pytest.mark.heavy
def test_kfac_trains_h2(helpers):
    """KFAC must optimize a small real ansatz on H2 without blowing up."""
    from deepqmc_tpu.fit import fit_wf
    from deepqmc_tpu.loss import create_loss_fn, median_log_squeeze_and_mask
    from deepqmc_tpu.observable import default_observable_monitors
    from deepqmc_tpu.optimizer import KFACOptimizer
    from deepqmc_tpu.presets import ansatz_preset
    from deepqmc_tpu.sampling import (
        DecorrSampler,
        MetropolisSampler,
        combine_samplers,
        initialize_sampler_state,
        initialize_sampling,
    )
    from deepqmc_tpu.types import TrainState
    from deepqmc_tpu.utils import InverseSchedule
    from deepqmc_tpu.wf import init_wf_params, instantiate_ansatz

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
    mols = [hamil.mol]
    mol_idx_sampler, sampler = initialize_sampling(
        helpers.rng(0),
        hamil,
        ansatz,
        mols,
        1,
        1,
        elec_sampler=partial(
            combine_samplers,
            [DecorrSampler(length=3), partial(MetropolisSampler, tau=1.0)],
        ),
    )
    params = init_wf_params(helpers.rng(1), hamil, ansatz, 1)
    smpl_state = initialize_sampler_state(
        helpers.rng(2), sampler, params, 128, mols
    )
    kfac_factory = partial(
        KFACOptimizer,
        kfac=partial(
            KFAC,
            learning_rate_schedule=InverseSchedule(0.05, 10000),
            damping_schedule=ConstantSchedule(1e-3),
            norm_constraint=1e-3,
        ),
    )
    energies = []
    for step, ts, mol_idxs, stats, _obs in fit_wf(
        helpers.rng(3),
        hamil,
        ansatz,
        kfac_factory,
        mol_idx_sampler,
        sampler,
        range(40),
        TrainState(smpl_state, params, None),
        partial(create_loss_fn, clip_mask_fn=median_log_squeeze_and_mask),
        [m.finalize(hamil, ansatz.apply) for m in default_observable_monitors()],
    ):
        energies.append(float(np.asarray(stats['local_energy/mean']).reshape(-1)[0]))
    energies = np.array(energies)
    assert np.isfinite(energies).all()
    assert energies[-10:].mean() < energies[:5].mean() - 0.03
    assert -1.5 < energies[-10:].mean() < -0.7


def test_kfac_repeated_dense_matches_kronecker_semantics(helpers):
    """A dense layer vmapped within a sample (the RepeatedDenseBlock case,
    reference kfacext.py:57-100): factors must be the per-repetition moments
    over [batch * repeats] with curvature scale R, i.e. the update must equal
    (A + pi*s)^-1 @ [W;b] @ (G + s/pi)^-1 / R with s = sqrt(damping / R) and
    per-repetition A = E[aa^T], G = E[gg^T] computed here by hand."""
    R_REPS, D_IN, D_OUT, N = 4, 3, 5, 64
    u = jax.random.normal(helpers.rng(10), (D_OUT,))

    def f(phys_conf, return_mos=False):
        x = phys_conf.r  # [R_REPS, 3] -- the layer sees a leading rep axis
        out = nn.Linear(D_OUT, name='rep')(x)  # [R_REPS, D_OUT]
        return Psi(jnp.array(1.0), (u * jnp.tanh(out)).sum())

    ansatz = nn.transform(f)
    r = jax.random.normal(helpers.rng(0), (1, 1, N, R_REPS, D_IN))
    pc = PhysicalConfiguration(
        jnp.zeros((1, 1, N, 1, 3)), r, jnp.zeros((1, 1, N), dtype=jnp.int32)
    )
    batch = (pc, jnp.ones((1, 1, N)), {})
    params = ansatz.init(helpers.rng(1), pc[0, 0, 0])

    def loss_fn(params_list, rng, batch):
        pc, *_ = batch
        logs = jax.vmap(lambda p: ansatz.apply(params_list[0], p).log)(
            jax.tree_util.tree_map(lambda x: x[0, 0], pc)
        )
        return logs.mean(), (logs, None, {})

    damping = 1e-2
    kfac = KFAC(
        jax.value_and_grad(loss_fn, has_aux=True),
        learning_rate_schedule=ConstantSchedule(1.0),
        damping_schedule=ConstantSchedule(damping),
        norm_constraint=1e12,
        curvature_ema=0.0,
    )
    kfac.bind_ansatz(ansatz)
    state = kfac.init(helpers.rng(2), [params], batch)
    new_params, *_ = kfac.step(helpers.rng(3), [params], state, batch)
    got = jnp.concatenate(
        [
            params['rep']['w'] - new_params[0]['rep']['w'],
            (params['rep']['b'] - new_params[0]['rep']['b'])[None],
        ]
    )

    # hand-computed factors: a = [x;1], g = d logpsi / d out = u*(1-tanh^2)
    x = np.asarray(r[0, 0].reshape(N * R_REPS, D_IN))
    a = np.concatenate([x, np.ones((len(x), 1))], axis=1)
    out = x @ np.asarray(params['rep']['w']) + np.asarray(params['rep']['b'])
    g = np.asarray(u) * (1 - np.tanh(out) ** 2)  # d sum(logpsi) / d out
    A = a.T @ a / len(a)
    G = g.T @ g / len(g)
    lam = damping / R_REPS
    pi = np.sqrt((np.trace(A) / A.shape[0]) / (np.trace(G) / G.shape[0]))
    A_d = A + (pi * np.sqrt(lam) + 1e-12) * np.eye(A.shape[0])
    G_d = G + (np.sqrt(lam) / pi + 1e-12) * np.eye(G.shape[0])
    # KFAC preconditions the actual loss gradient
    (_, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        [params], None, batch
    )
    grad = np.concatenate(
        [np.asarray(grads[0]['rep']['w']), np.asarray(grads[0]['rep']['b'])[None]]
    )
    expected = np.linalg.solve(A_d, grad @ np.linalg.inv(G_d)) / R_REPS
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5, atol=1e-10)

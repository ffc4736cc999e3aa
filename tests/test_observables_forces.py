from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepqmc_tpu.force import (
    evaluate_hf_force_ac_zv,
    evaluate_hf_force_ac_zvq,
    evaluate_hf_force_ac_zvzb,
    evaluate_hf_force_ac_zvzbq,
    evaluate_hf_force_bare,
)
from deepqmc_tpu.oscillator_strength import compute_oscillator_strength
from deepqmc_tpu.types import Psi


def simple_wf(alpha=0.6):
    def wf(params, phys_conf):
        d = jnp.linalg.norm(
            phys_conf.r[:, None] - phys_conf.R[None], axis=-1
        )
        return Psi(jnp.array(1.0), -alpha * d.min(-1).sum())

    return wf


@pytest.fixture(scope='module')
def h2_setup(helpers):
    hamil = helpers.hamil(mol=helpers.mol('H2'))
    pc = helpers.phys_conf(hamil)
    return hamil, pc


def test_bare_force_analytic(h2_setup):
    hamil, pc = h2_setup
    f = evaluate_hf_force_bare(hamil)({}, pc)
    assert f.shape == (2, 3)
    # manual: nuclear-nuclear repulsion + electron attraction
    R, r = np.asarray(pc.R), np.asarray(pc.r)
    d01 = R[0] - R[1]
    f_nn = d01 / np.linalg.norm(d01) ** 3
    d_e = R[0] - r
    f_en = -(d_e / np.linalg.norm(d_e, axis=-1, keepdims=True) ** 3).sum(0)
    assert np.allclose(f[0], f_nn + f_en, rtol=1e-6)


def test_force_estimators_finite(h2_setup):
    hamil, pc = h2_setup
    wf = simple_wf()
    e_loc, _ = hamil.local_energy(wf)(None, {}, pc)
    energy = e_loc
    for est in (
        evaluate_hf_force_ac_zv(hamil, wf),
        evaluate_hf_force_ac_zvq(hamil, wf),
    ):
        f = est({}, pc)
        assert f.shape == (2, 3)
        assert np.isfinite(np.asarray(f)).all()
    for est in (
        evaluate_hf_force_ac_zvzb(hamil, wf),
        evaluate_hf_force_ac_zvzbq(hamil, wf),
    ):
        f = est({}, pc, e_loc, energy)
        assert f.shape == (2, 3)
        assert np.isfinite(np.asarray(f)).all()


def test_directional_grad_wf_matches_direct_gradient(h2_setup):
    """(sign, log) of d psi/dR_ij from the log-space jvp must equal the
    direct gradient of psi = sign * exp(log)."""
    from deepqmc_tpu.force import directional_grad_wf

    hamil, pc = h2_setup
    wf = simple_wf()

    def psi_val(R):
        p = wf({}, pc.replace(R=R))
        return p.sign * jnp.exp(p.log)

    grad_psi = np.asarray(jax.grad(psi_val)(pc.R))
    for i in range(2):
        for j in range(3):
            e = jnp.zeros((2, 3)).at[i, j].set(1.0)
            d = directional_grad_wf(wf, e)({}, pc)
            val = float(d.sign * jnp.exp(d.log))
            assert np.isclose(val, grad_psi[i, j], rtol=1e-6), (i, j)


def test_zvq_contraction_matches_jacobian(h2_setup):
    """The jvp-based ZV term must equal the explicit grad-Q contraction."""
    from deepqmc_tpu.force import Q, evaluate_hf_force_ac_zvq
    from deepqmc_tpu.physics import coulomb_force

    hamil, pc = h2_setup
    wf = simple_wf()
    f = np.asarray(evaluate_hf_force_ac_zvq(hamil, wf)({}, pc))
    charges = jnp.asarray(hamil.mol.charges)
    grad_Q = jax.jacfwd(lambda r: Q(r, pc.R, charges))(pc.r)
    grad_log_psi = jax.grad(lambda r: wf({}, pc.replace(r=r)).log)(pc.r)
    expected = (grad_Q * grad_log_psi[None, None]).sum((-1, -2)) + coulomb_force(
        pc.R, pc.R, charges, charges, True
    )
    assert np.allclose(f, np.asarray(expected), rtol=1e-6)


def test_oscillator_strength_shapes(helpers):
    rng = np.random.default_rng(0)
    n_states, n = 3, 200
    e = jnp.asarray(rng.normal(size=(n_states, n)) - np.arange(n_states)[:, None])
    ratios = jnp.asarray(rng.normal(size=(n_states, n_states, n)) * 0.1)
    rs = jnp.asarray(rng.normal(size=(n_states, n, 4, 3)))
    (os_mean, os_err), (tdm, tdm_err), (ex, ex_err) = compute_oscillator_strength(
        e, ratios, rs
    )
    assert os_mean.shape == (n_states, n_states)
    assert np.isfinite(np.asarray(os_mean)).all()
    # excitation energies antisymmetric
    assert np.allclose(np.asarray(ex), -np.asarray(ex).T, atol=1e-6)


def test_postprocess_roundtrip(tmp_path):
    import h5py

    from deepqmc_tpu.postprocess import read_and_convert_result, read_workdir

    sub = tmp_path / 'training'
    sub.mkdir()
    with h5py.File(sub / 'result.h5', 'w') as f:
        f['local_energy/samples'] = np.arange(24.0).reshape(6, 1, 4)
        f['mol_idxs'] = np.tile(np.arange(2), 3).reshape(6, 1)
    (sub / 'chkpt-5.pt').write_bytes(b'x')
    results, last_iter = read_workdir(tmp_path, ['local_energy/samples', 'mol_idxs'])
    assert last_iter == 5
    assert results['local_energy/samples'].shape == (6, 1, 4)
    per_mol = read_and_convert_result(tmp_path, 'local_energy/samples')
    assert per_mol['local_energy/samples'].shape == (3, 2, 4)


def test_monitor_grid_vmap_routes_per_state_params(h2_setup):
    """SpinMonitor (the grid_vmap path) must pair each electronic state's
    walkers with that state's OWN parameter slice — regression for the
    round-3 fix where the full state-stacked params pytree leaked into the
    single-sample wf (multi-state shapes exploded; single-state silently
    carried a spurious leading axis)."""
    from deepqmc_tpu.observable import SpinMonitor
    from deepqmc_tpu.physics import evaluate_spin

    hamil, pc = h2_setup
    m, s, w = 1, 2, 3

    def wf(params, phys_conf):
        d = jnp.linalg.norm(phys_conf.r[:, None] - phys_conf.R[None], axis=-1)
        return Psi(jnp.array(1.0), -params['alpha'] * d.min(-1).sum())

    params = {'alpha': jnp.array([0.5, 0.9])}  # leading state axis
    grid_pc = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (m, s, w, *x.shape)), pc
    )
    # decorrelate the states' walkers so a params mix-up changes the values
    grid_pc = grid_pc.replace(
        r=grid_pc.r + 0.1 * jnp.arange(m * s * w).reshape(m, s, w, 1, 1)
    )
    monitor = SpinMonitor(save_samples=True, period=1).finalize(hamil, wf)
    e_loc = jnp.zeros((m, s, w))
    psi = Psi(jnp.ones((m, s, w)), jnp.zeros((m, s, w)))
    stats = monitor(0, params, grid_pc, psi, e_loc, None)
    samples = np.asarray(stats['spin/samples'])
    assert samples.shape == (m, s, w)
    for i in range(s):
        for k in range(w):
            ref = evaluate_spin(hamil, wf)(
                {'alpha': params['alpha'][i]},
                jax.tree_util.tree_map(lambda x: x[0, i, k], grid_pc),
            )
            assert np.allclose(samples[0, i, k], float(ref), rtol=1e-6), (i, k)


def test_oscillator_strength_statistics_mol_axis():
    """Monitor-path estimator agrees with the postprocess estimator.

    Regression: the state-pair energy gap used to broadcast over the
    MOLECULE axis (``e[None, :] - e[:, None]`` on a ``[mol, state]`` array),
    which collapses to exact zeros for a single molecule — every recorded
    oscillator strength was 0.0 and every error NaN.
    """
    from deepqmc_tpu.observable import Batch, oscillator_strength_statistics
    from deepqmc_tpu.types import PhysicalConfiguration

    rng = np.random.default_rng(1)
    m, s, w, ne = 1, 2, 64, 3
    e = jnp.asarray(
        rng.normal(size=(m, s, w)) + np.array([0.0, 1.0])[None, :, None]
    )
    ratios = jnp.asarray(rng.normal(size=(m, s, s, w)) * 0.3)
    rs = jnp.asarray(rng.normal(size=(m, s, w, ne, 3)))
    batch = Batch(
        None,
        PhysicalConfiguration(jnp.zeros((m, s, w, 1, 3)), rs, jnp.zeros((m, s, w), jnp.int32)),
        None,
        e,
        ratios,
    )
    stats = oscillator_strength_statistics(batch, None)
    f = np.asarray(stats['oscillator_strength/mean'])
    f_err = np.asarray(stats['oscillator_strength/err'])
    assert f.shape == (m, s, s) and f_err.shape == (m, s, s)
    assert np.allclose(np.diagonal(f, axis1=1, axis2=2), 0.0)
    assert f[0, 0, 1] != 0.0 and np.isfinite(f).all()
    assert np.isfinite(f_err).all()
    # means agree with the postprocess estimator (single molecule)
    (f_ref, _), _, _ = compute_oscillator_strength(e[0], ratios[0], rs[0])
    np.testing.assert_allclose(f[0], np.asarray(f_ref), rtol=1e-6)

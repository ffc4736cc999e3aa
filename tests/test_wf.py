import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepqmc_tpu.physics import loop_laplacian
from deepqmc_tpu.presets import ansatz_preset
from deepqmc_tpu.wf import instantiate_ansatz

PRESETS = ['default', 'ferminet', 'psiformer']


def small_kwargs(preset):
    kw = {'n_determinants': 2, 'embedding_dim': 32, 'n_interactions': 2}
    if preset != 'psiformer':
        kw['two_particle_stream_dim'] = 8
    else:
        kw['num_heads'] = 2
    return kw


@pytest.fixture(scope='module', params=PRESETS)
def ansatz_and_conf(request, helpers):
    hamil = helpers.hamil()
    ansatz = instantiate_ansatz(
        hamil, ansatz_preset(request.param, **small_kwargs(request.param))
    )
    pc = helpers.phys_conf(hamil)
    params = ansatz.init(helpers.rng(1), pc)
    return request.param, hamil, ansatz, params, pc


def test_psi_finite_and_deterministic(ansatz_and_conf):
    _, _, ansatz, params, pc = ansatz_and_conf
    psi1 = ansatz.apply(params, pc)
    psi2 = ansatz.apply(params, pc)
    assert np.isfinite(float(psi1.log))
    assert float(psi1.sign) in (-1.0, 1.0)
    assert float(psi1.log) == float(psi2.log)


def test_antisymmetry(ansatz_and_conf):
    _, hamil, ansatz, params, pc = ansatz_and_conf
    psi = ansatz.apply(params, pc)
    # swap two same-spin (up) electrons
    perm = jnp.arange(hamil.n_up + hamil.n_down).at[0].set(1).at[1].set(0)
    pc_swapped = pc.replace(r=pc.r[perm])
    psi_swapped = ansatz.apply(params, pc_swapped)
    assert float(psi_swapped.log) == pytest.approx(float(psi.log), rel=1e-8)
    assert float(psi_swapped.sign) == -float(psi.sign)
    # swap two opposite-spin electrons: magnitude must change
    perm2 = jnp.arange(hamil.n_up + hamil.n_down).at[0].set(2).at[2].set(0)
    psi_anti = ansatz.apply(params, pc.replace(r=pc.r[perm2]))
    assert float(psi_anti.log) != pytest.approx(float(psi.log), rel=1e-8)


def test_grad_params_finite(ansatz_and_conf):
    _, _, ansatz, params, pc = ansatz_and_conf
    grads = jax.grad(lambda p: ansatz.apply(p, pc).log)(params)
    flat = jnp.concatenate(
        [leaf.reshape(-1) for leaf in jax.tree_util.tree_leaves(grads)]
    )
    assert np.isfinite(np.asarray(flat)).all()
    assert float(jnp.abs(flat).max()) > 0


def test_laplacian_finite(ansatz_and_conf):
    _, _, ansatz, params, pc = ansatz_and_conf

    def log_psi(r_flat):
        return ansatz.apply(params, pc.replace(r=r_flat.reshape(-1, 3))).log

    lap, grad = loop_laplacian(log_psi)(pc.r.flatten())
    assert np.isfinite(float(lap))
    assert np.isfinite(np.asarray(grad)).all()


def test_return_mos_shapes(ansatz_and_conf):
    _, hamil, ansatz, params, pc = ansatz_and_conf
    orb_up, orb_down = ansatz.apply(params, pc, True)
    n_el = hamil.n_up + hamil.n_down
    # full determinants: [n_det, n_up/down, n_orb=total electrons]
    assert orb_up.shape == (2, hamil.n_up, n_el)
    assert orb_down.shape == (2, hamil.n_down, n_el)


def test_vmap_batching(ansatz_and_conf):
    _, hamil, ansatz, params, pc_single = ansatz_and_conf
    hamil_pc = hamil.init_sample(jax.random.PRNGKey(7), hamil.mol.coords, 5)
    psi = jax.vmap(ansatz.apply, (None, 0))(params, hamil_pc)
    assert psi.log.shape == (5,)
    assert np.isfinite(np.asarray(psi.log)).all()


def test_param_counts_differ_between_presets(helpers):
    hamil = helpers.hamil()
    pc = helpers.phys_conf(hamil)
    counts = {}
    for preset in PRESETS:
        ansatz = instantiate_ansatz(
            hamil, ansatz_preset(preset, **small_kwargs(preset))
        )
        params = ansatz.init(helpers.rng(0), pc)
        counts[preset] = sum(
            leaf.size for leaf in jax.tree_util.tree_leaves(params)
        )
    assert len(set(counts.values())) == 3

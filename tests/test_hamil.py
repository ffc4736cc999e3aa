import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepqmc_tpu.hamil import MolecularHamiltonian, get_shell
from deepqmc_tpu.molecule import Molecule
from deepqmc_tpu.physics import (
    loop_laplacian,
    pairwise_diffs,
    pairwise_distance,
    pairwise_self_distance,
    vmap_laplacian,
)
from deepqmc_tpu.types import Psi


def test_get_shell():
    assert [get_shell(z) for z in [0, 1, 2, 3, 10, 11, 18]] == [0, 1, 1, 2, 2, 3, 3]


def test_counts_lih(helpers):
    h = helpers.hamil()
    assert (h.n_up, h.n_down, h.n_nuc) == (2, 2, 2)


def test_counts_open_shell():
    h = MolecularHamiltonian(mol=Molecule.from_name('B'))
    assert (h.n_up, h.n_down) == (3, 2)


def test_init_sample_shapes(helpers):
    h = helpers.hamil()
    pc = h.init_sample(helpers.rng(), h.mol.coords, 16)
    assert pc.r.shape == (16, 4, 3)
    assert pc.R.shape == (16, 2, 3)
    # electrons should start near the nuclei
    d = pairwise_distance(pc.r.reshape(-1, 3), h.mol.coords).min(-1)
    assert float(d.max()) < 12.0


def test_init_sample_charged_system():
    mol = Molecule(
        coords=[[0.0, 0.0, 0.0], [2.0, 0.0, 0.0]],
        charges=[3, 1],
        charge=1,
        spin=1,
    )
    h = MolecularHamiltonian(mol=mol)
    assert h.n_up + h.n_down == 3
    pc = h.init_sample(jax.random.PRNGKey(0), mol.coords, 4)
    assert pc.r.shape == (4, 3, 3)


def test_pairwise_kernels():
    a = jnp.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    b = jnp.array([[0.0, 1.0, 0.0]])
    assert np.allclose(pairwise_distance(a, b), [[1.0], [np.sqrt(2)]])
    diffs = pairwise_diffs(a, b)
    assert diffs.shape == (2, 1, 4)
    assert np.allclose(diffs[1, 0], [1.0, -1.0, 0.0, 2.0])
    d = pairwise_self_distance(a, full=True)
    assert d.shape == (2, 2)
    assert np.allclose(d, [[0, 1], [1, 0]])


def _gaussian_wf(alpha):
    """logpsi = -alpha/2 * sum r_i^2, analytic laplacian available."""

    def wf(params, phys_conf):
        log = -0.5 * alpha * (phys_conf.r**2).sum()
        return Psi(jnp.array(1.0), log)

    return wf


@pytest.mark.parametrize('lap_factory', [loop_laplacian, vmap_laplacian])
def test_laplacian_of_gaussian(helpers, lap_factory):
    alpha = 0.7
    f = lambda r_flat: -0.5 * alpha * (r_flat**2).sum()
    r = jax.random.normal(helpers.rng(), (4, 3)).flatten()
    lap, grad = lap_factory(f)(r)
    assert np.allclose(lap, -alpha * 12)
    assert np.allclose(grad, -alpha * r)


def test_local_energy_gaussian(helpers):
    h = helpers.hamil()
    pc = helpers.phys_conf(h)
    alpha = 0.9
    loc = h.local_energy(_gaussian_wf(alpha))
    e, stats = loc(None, {}, pc)
    # analytic values
    r = pc.r
    e_kin = -0.5 * (-alpha * 3 * 4 + alpha**2 * (r**2).sum())
    v_nuc_el = -(h.mol.charges / pairwise_distance(r, pc.R)).sum()
    v_el = (1 / pairwise_self_distance(r)).sum()
    e_nuc = (3.0 * 1.0) / jnp.linalg.norm(pc.R[0] - pc.R[1])
    assert float(e) == pytest.approx(float(e_kin + v_nuc_el + v_el + e_nuc), rel=1e-10)
    assert stats['hamil/V_nl'] == 0.0


def test_local_energy_laplacian_factories_agree(helpers):
    h1 = helpers.hamil()
    h2 = helpers.hamil(laplacian_factory=vmap_laplacian)
    pc = helpers.phys_conf(h1)

    def wf(params, phys_conf):
        # a nontrivial correlated wave function
        d = pairwise_self_distance(phys_conf.r)
        log = -0.3 * (phys_conf.r**2).sum() + 0.2 * jnp.log1p(d).sum()
        return Psi(jnp.array(1.0), log)

    e1, _ = h1.local_energy(wf)(None, {}, pc)
    e2, _ = h2.local_energy(wf)(None, {}, pc)
    assert float(e1) == pytest.approx(float(e2), rel=1e-10)

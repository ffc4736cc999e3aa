import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepqmc_tpu import units
from deepqmc_tpu.ewm import init_ewm, init_multi_mol_multi_state_ewm
from deepqmc_tpu.molecule import Molecule
from deepqmc_tpu.parallel import get_mesh, pexp_normalize_mean, shard_walkers
from deepqmc_tpu.utils import (
    log_squeeze,
    masked_mean,
    multinomial_resampling,
    tree_stack,
    tree_unstack,
    triu_flat,
)


def test_units_roundtrip():
    assert units.bohr_to_angstrom(units.angstrom_to_bohr(1.23)) == pytest.approx(1.23)
    assert units.hartree_to_eV(1.0) == pytest.approx(27.2114, abs=1e-3)
    assert units.kcal_mol_to_hartree(units.hartree_to_kcal_mol(0.7)) == pytest.approx(
        0.7
    )


@pytest.mark.parametrize(
    'name,n_nuc,spin',
    [('H2', 2, 0), ('LiH', 2, 0), ('H2O', 3, 0), ('B', 1, 1), ('ScO', 2, 1)],
)
def test_molecule_database(name, n_nuc, spin):
    mol = Molecule.from_name(name)
    assert len(mol) == n_nuc
    assert mol.spin == spin
    assert mol.coords.shape == (n_nuc, 3)


def test_molecule_unknown_name():
    with pytest.raises(ValueError):
        Molecule.from_name('unobtanium')


def test_molecule_angstrom_conversion():
    mol = Molecule.from_name('H2')
    assert np.allclose(mol.coords[1, 0], units.angstrom_to_bohr(0.742))


def test_multinomial_resampling_statistics():
    rng = jax.random.PRNGKey(0)
    weights = jnp.array([0.0, 0.0, 1.0, 3.0])
    idx = multinomial_resampling(rng, weights, 4000)
    counts = np.bincount(np.asarray(idx), minlength=4)
    assert counts[0] == counts[1] == 0
    assert counts[3] / counts[2] == pytest.approx(3.0, rel=0.15)


def test_tree_stack_unstack_roundtrip():
    trees = [{'a': jnp.ones(3) * i, 'b': jnp.zeros((2, 2)) + i} for i in range(4)]
    stacked = tree_stack(trees)
    assert stacked['a'].shape == (4, 3)
    back = tree_unstack(stacked)
    assert np.allclose(back[2]['a'], trees[2]['a'])


def test_masked_mean():
    x = jnp.array([1.0, 2.0, 100.0])
    mask = jnp.array([True, True, False])
    assert masked_mean(x, mask) == pytest.approx(1.5)


def test_log_squeeze_properties():
    x = jnp.linspace(-5, 5, 101)
    y = log_squeeze(x)
    assert np.allclose(y, -log_squeeze(-x))  # odd function
    assert np.all(np.diff(np.asarray(y)) > 0)  # monotone
    small = jnp.array(1e-4)
    assert log_squeeze(small) == pytest.approx(1e-4, rel=1e-3)


def test_triu_flat():
    x = jnp.arange(9).reshape(3, 3)
    assert np.array_equal(triu_flat(x), [1, 2, 5])


def test_pexp_normalize_mean():
    log_w = jnp.array([0.0, 1.0, -2.0, 700.0])  # huge value must not overflow
    w = pexp_normalize_mean(log_w)
    assert np.isfinite(np.asarray(w)).all()
    assert jnp.mean(w) == pytest.approx(1.0)


def test_mesh_and_sharding():
    mesh = get_mesh()
    assert mesh.size == 8
    x = jnp.zeros((2, 1, 16, 3))
    sharded = shard_walkers({'r': x})['r']
    assert sharded.shape == x.shape
    # axis 2 is split over the 8 devices
    shard_shapes = {s.data.shape for s in sharded.addressable_shards}
    assert shard_shapes == {(2, 1, 2, 3)}


def test_ewm_converges_to_mean():
    state, update = init_ewm()
    rng = np.random.default_rng(0)
    xs = 3.0 + 0.1 * rng.standard_normal(500)
    for x in xs:
        state = update(jnp.asarray(x), state)
    assert float(state.mean) == pytest.approx(3.0, abs=0.05)
    assert float(jnp.sqrt(state.sqerr)) < 0.05


def test_ewm_grid_subset_update():
    state, update = init_multi_mol_multi_state_ewm(shape=(3, 2))
    x = jnp.ones((2, 2))
    state = update(x, state, jnp.array([0, 2]))
    assert np.isfinite(np.asarray(state.mean[jnp.array([0, 2])])).all()
    assert np.isnan(np.asarray(state.mean[1])).all()

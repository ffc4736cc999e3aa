from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.special import legendre

from deepqmc_tpu.ecp import parse_gamess_ecp, register_ecp_params
from deepqmc_tpu.ecp.ecp_utils import get_unit_icosahedron_sph, sph2cart
from deepqmc_tpu.ecp.gaussian_type_ecp import GaussianTypeECP
from deepqmc_tpu.hamil import MolecularHamiltonian
from deepqmc_tpu.molecule import Molecule
from deepqmc_tpu.types import PhysicalConfiguration, Psi

# synthetic but realistically-shaped parameters for Li (He core, Z_eff = 1)
LI_LOCAL = [
    [[3.5, 1.2]],  # r^-1 class: beta * exp(-alpha r^2) / r
    [[2.8, 6.5]],  # r^0 class
    [[2.0, -1.1]],  # r^1 class
]
LI_NONLOCAL = [[[2.2, 3.0]]]  # l = 0 channel

register_ecp_params('testecp', 3, 2, LI_LOCAL, LI_NONLOCAL)


@pytest.fixture(scope='module')
def lih_ecp_hamil():
    mol = Molecule.from_name('LiH')
    return MolecularHamiltonian(mol=mol, ecp_type='testecp', ecp_mask=[True, False])


def test_valence_counting(lih_ecp_hamil):
    h = lih_ecp_hamil
    assert np.allclose(h.ns_valence, [1.0, 1.0])
    assert (h.n_up, h.n_down) == (1, 1)


def test_icosahedron_quadrature_exactness():
    """The 12-point quadrature must integrate P_l exactly for l = 1..5."""
    thetas = np.asarray(get_unit_icosahedron_sph())[:, 0]
    for l in range(6):
        val = np.mean(np.polyval(legendre(l).coef, np.cos(thetas)))
        assert val == pytest.approx(1.0 if l == 0 else 0.0, abs=1e-12)
    # vertices lie on the unit sphere
    verts = np.asarray(sph2cart(get_unit_icosahedron_sph()))
    assert np.allclose(np.linalg.norm(verts, axis=-1), 1.0)


def test_local_potential_value(lih_ecp_hamil):
    h = lih_ecp_hamil
    rng = jax.random.PRNGKey(0)
    pc = h.init_sample(rng, h.mol.coords, 1)[0]
    v = float(h.potential.local_potential(pc))
    # manual computation
    r = np.asarray(pc.r)
    R = np.asarray(pc.R)
    d = np.linalg.norm(r[:, None] - R[None], axis=-1)
    expected = -(1.0 / d[:, 0] + 1.0 / d[:, 1]).sum()
    (a1, b1), (a2, b2), (a3, b3) = (cls[0] for cls in LI_LOCAL)
    dli = d[:, 0]
    expected += (
        b1 * np.exp(-a1 * dli**2) / dli
        + b2 * np.exp(-a2 * dli**2)
        + b3 * dli * np.exp(-a3 * dli**2)
    ).sum()
    assert v == pytest.approx(expected, rel=1e-6)


def test_nonlocal_potential_s_wave(lih_ecp_hamil):
    """For a spherically symmetric wf the projection reduces to sum_i V_0(r_i)."""
    h = lih_ecp_hamil
    rng = jax.random.PRNGKey(1)
    pc = h.init_sample(rng, h.mol.coords, 1)[0]

    def wf(phys_conf):
        d = jnp.linalg.norm(phys_conf.r - phys_conf.R[0], axis=-1)
        return Psi(jnp.array(1.0), -0.5 * (d**2).sum())

    v_nl = float(h.potential.nonloc_potential(jax.random.PRNGKey(2), pc, wf))
    d = np.linalg.norm(np.asarray(pc.r) - np.asarray(pc.R)[0], axis=-1)
    a, b = LI_NONLOCAL[0][0]
    expected = (b * np.exp(-a * d**2)).sum()
    assert v_nl == pytest.approx(expected, rel=1e-6)


def test_nonlocal_zero_for_orthogonal_channel(lih_ecp_hamil):
    """A pure p-like angular factor has zero overlap with the l=0 projector."""
    h = lih_ecp_hamil
    pc = PhysicalConfiguration(
        h.mol.coords,
        jnp.array([[0.5, 0.3, 0.8], [2.5, -0.3, 0.2]]),
        jnp.array(0),
    )

    def wf(phys_conf):
        rel = phys_conf.r - phys_conf.R[0]
        d = jnp.linalg.norm(rel, axis=-1)
        # psi = prod_i (z_i / r_i) * exp(-r_i^2 / 2): odd (l=1) about nucleus 0
        val = jnp.prod(rel[:, 2] / d) * jnp.exp(-0.5 * (d**2).sum())
        return Psi(jnp.sign(val), jnp.log(jnp.abs(val)))

    v_nl = float(h.potential.nonloc_potential(jax.random.PRNGKey(3), pc, wf))
    assert v_nl == pytest.approx(0.0, abs=1e-10)


def test_local_energy_with_ecp(lih_ecp_hamil):
    h = lih_ecp_hamil

    def wf(params, phys_conf):
        return Psi(jnp.array(1.0), -0.4 * (phys_conf.r**2).sum())

    pc = h.init_sample(jax.random.PRNGKey(4), h.mol.coords, 1)[0]
    e, stats = h.local_energy(wf)(jax.random.PRNGKey(5), {}, pc)
    assert np.isfinite(float(e))
    assert float(jnp.abs(stats['hamil/V_nl'])) > 0


def test_gamess_parser():
    text = """Li-ECP GEN 2 1
3
1.00000000 1 3.50000000
6.50000000 2 2.80000000
-1.10000000 3 2.00000000
1
3.00000000 2 2.20000000
"""
    sym, n_core, local, nonlocal_ = parse_gamess_ecp(text)
    assert sym == 'Li' and n_core == 2
    assert local[0] == [[3.5, 1.0]]
    assert local[1] == [[2.8, 6.5]]
    assert local[2] == [[2.0, -1.1]]
    assert nonlocal_ == [[[2.2, 3.0]]]


# --- packaged parameter tables (ecp/tables/) --------------------------------

REF_POTENTIAL = Path('/root/reference/tests/test_potential')


def _require_legacy_stream():
    from parity_utils import legacy_stream_reproduces

    if not legacy_stream_reproduces():
        pytest.skip(
            'this jax version does not reproduce the PRNG stream behind the '
            'reference goldens (see tests/test_reference_parity.py); table '
            'values are regression-pinned stream-independently by '
            'test_local_potential_pinned'
        )


@pytest.mark.skipif(not REF_POTENTIAL.exists(), reason='reference goldens absent')
@pytest.mark.parametrize('ecp_type', ['bfd', 'ccECP'])
def test_packaged_tables_against_reference_goldens(ecp_type):
    """The packaged carbon tables reproduce the reference's golden values.

    The golden local potential (f64, /root/reference/tests/test_potential/)
    is evaluated at a bitwise-reproducible walker configuration (when the
    legacy jax stream is available — skipped otherwise); its difference
    from the pure effective-Coulomb part isolates the Gaussian local terms,
    validating the parameter table itself (the delta is ~3e-9 for bfd and
    consistent with zero for ccECP at these electron-nucleus distances).
    """
    _require_legacy_stream()
    old = jax.config.jax_threefry_partitionable
    jax.config.update('jax_threefry_partitionable', False)
    try:
        golden = float(
            np.load(
                REF_POTENTIAL / f'test_pseudo_potentials_C_{ecp_type}_.npz'
            )['local_potential']
        )
        mol = Molecule.from_name('C')
        h = MolecularHamiltonian(mol=mol, ecp_type=ecp_type)
        pc = h.init_sample(jax.random.PRNGKey(0), mol.coords, 1, 1.0)[0]
        got = float(h.potential.local_potential(pc))
        # resolves the Gaussian terms: tolerance well below the bfd delta
        assert got == pytest.approx(golden, abs=2e-12)
    finally:
        jax.config.update('jax_threefry_partitionable', old)


def test_packaged_tables_out_of_the_box():
    """C/N/O ccECP hamiltonians build with zero registration or env setup."""
    for name, n_valence in (('C', 4), ('NH3', 5 + 3), ('H2O', 10 - 2)):
        mol = Molecule.from_name(name)
        h = MolecularHamiltonian(mol=mol, ecp_type='ccECP')
        assert int(np.asarray(h.ns_valence).sum()) == n_valence
        pc = h.init_sample(jax.random.PRNGKey(1), mol.coords, 2)
        assert np.isfinite(
            np.asarray(jax.vmap(h.potential.local_potential)(pc))
        ).all()


@pytest.mark.skipif(not REF_POTENTIAL.exists(), reason='reference goldens absent')
@pytest.mark.parametrize('ecp_type', ['bfd', 'ccECP'])
def test_packaged_lih_tables_against_reference_goldens(ecp_type):
    """Packaged Li tables reproduce the reference's LiH golden potentials.

    The LiH golden configuration's electrons sit >2 bohr from the Li core,
    so this pins n_core/Z_eff (and the walker-init heuristic) tightly but
    the short-range Gaussian terms only weakly — see ecp/tables/README.md.
    Skipped when the legacy jax stream is unavailable.
    """
    _require_legacy_stream()
    old = jax.config.jax_threefry_partitionable
    jax.config.update('jax_threefry_partitionable', False)
    try:
        golden = float(
            np.load(
                REF_POTENTIAL / f'test_pseudo_potentials_LiH_{ecp_type}_.npz'
            )['local_potential']
        )
        mol = Molecule.from_name('LiH')
        h = MolecularHamiltonian(mol=mol, ecp_type=ecp_type)
        pc = h.init_sample(jax.random.PRNGKey(0), mol.coords, 1, 1.0)[0]
        got = float(h.potential.local_potential(pc))
        assert got == pytest.approx(golden, rel=1e-6)
    finally:
        jax.config.update('jax_threefry_partitionable', old)


def test_sc_table_loads_with_refit_disclosure_and_matches_ae_valence(caplog):
    """ScO + ccECP builds from the in-house-refit Sc table, WITH disclosure.

    The Sc table is an in-house LDA-refit (tables/README.md): its valence
    physics is verified against the in-repo all-electron oracle (spot-check
    the 3d eigenvalue here; full evidence docs/evidence/ecp_fit_Sc_refit.json),
    but it is NOT the published ccECP file, so loading it must emit a runtime
    warning saying so (a user must not silently label results 'ccECP').
    """
    import logging

    from deepqmc_tpu.ecp.data import _REGISTRY, _SOURCE, get_ecp_params
    from deepqmc_tpu.ecp.radial_atom import solve_atom

    _REGISTRY.pop(('ccecp', 21), None)
    _SOURCE.pop(('ccecp', 21), None)
    with caplog.at_level(logging.WARNING, logger='deepqmc_tpu.ecp.data'):
        h = MolecularHamiltonian(mol=Molecule.from_name('ScO'), ecp_type='ccECP')
    # Ne-core Sc (Z_eff 11) + ccECP O (Z_eff 6)
    assert np.asarray(h.ns_valence).tolist() == [11.0, 6.0]
    pc = h.init_sample(jax.random.PRNGKey(1), h.mol.coords, 2)
    assert np.isfinite(
        np.asarray(jax.vmap(h.potential.local_potential)(pc))
    ).all()
    assert any(
        'IN-HOUSE' in r.message and 'Sc' in r.message for r in caplog.records
    ), 'in-house refit table must disclose itself at load time'

    grid = {'rmin': 1e-6, 'n_grid': 1500}
    ae = solve_atom(21, {0: [2, 2, 2, 2], 1: [6, 6], 2: [1]}, **grid)
    pp = solve_atom(
        21,
        {0: [2, 2], 1: [6], 2: [1]},
        ecp_params=get_ecp_params('ccECP', 21),
        **grid,
    )
    assert abs(pp.eigenvalues[(2, 0)] - ae.eigenvalues[(2, 0)]) < 0.02


def test_unpackaged_element_raises():
    with pytest.raises(ValueError, match='No .* ECP parameters'):
        # no bfd table for Sc is packaged, not even provisionally
        MolecularHamiltonian(mol=Molecule.from_name('ScO'), ecp_type='bfd')


def _reset_key(ecp_type, z):
    from deepqmc_tpu.ecp.data import _LOADED_DIRS, _REGISTRY, _SOURCE

    _REGISTRY.pop((ecp_type.lower(), z), None)
    _SOURCE.pop((ecp_type.lower(), z), None)
    _LOADED_DIRS.clear()


def test_published_n_table_is_default():
    """The packaged N ccECP table is the published file (s-projector exponent
    9.78499, local identity 46.17505 = 5 * 9.23501), not the in-house refit."""
    from deepqmc_tpu.ecp.data import get_ecp_params

    _reset_key('ccECP', 7)
    n_core, local, nonlocal_ = get_ecp_params('ccECP', 7)
    assert n_core == 2
    assert local[0][0][0] == pytest.approx(9.23501)
    assert local[2][0][1] == pytest.approx(5 * 9.23501)
    assert nonlocal_[0][0][0] == pytest.approx(9.78499)
    _reset_key('ccECP', 7)


def test_refit_n_table_is_opt_in(monkeypatch):
    from deepqmc_tpu.ecp.data import get_ecp_params

    _reset_key('ccECP', 7)
    monkeypatch.setenv('DEEPQMC_TPU_ECP_USE_REFIT', 'N')
    n_core, local, nonlocal_ = get_ecp_params('ccECP', 7)
    assert n_core == 2
    assert nonlocal_[0][0][0] == pytest.approx(11.07130538)
    _reset_key('ccECP', 7)


def test_ecp_dir_overrides_packaged_table(monkeypatch, tmp_path):
    """A published-file directory via DEEPQMC_TPU_ECP_DIR must win over ANY
    packaged table, including ones already registered (ADVICE round 2)."""
    from deepqmc_tpu.ecp.data import get_ecp_params

    _reset_key('ccECP', 21)
    # register the packaged (in-house refit) Sc first, as a prior call would
    packaged = get_ecp_params('ccECP', 21)
    assert packaged[0] == 10
    (tmp_path / 'Sc.ccECP.gamess').write_text(
        'Sc-ECP GEN 10 2\n'
        '1\n'
        '11.00000000 1 8.50000000\n'
        '1\n'
        '100.00000000 2 10.00000000\n'
        '1\n'
        '50.00000000 2 9.00000000\n'
    )
    monkeypatch.setenv('DEEPQMC_TPU_ECP_DIR', str(tmp_path))
    n_core, local, nonlocal_ = get_ecp_params('ccECP', 21)
    assert n_core == 10
    assert local[0][0][0] == pytest.approx(8.5), 'env-dir table must override'
    assert nonlocal_[0][0][0] == pytest.approx(10.0)
    _reset_key('ccECP', 21)


def test_programmatic_registration_wins_over_dir(monkeypatch, tmp_path):
    from deepqmc_tpu.ecp.data import get_ecp_params

    _reset_key('ccECP', 3)
    (tmp_path / 'Li.ccECP.gamess').write_text(
        'Li-ECP GEN 2 0\n1\n1.00000000 1 2.00000000\n'
    )
    monkeypatch.setenv('DEEPQMC_TPU_ECP_DIR', str(tmp_path))
    register_ecp_params('ccECP', 3, 2, LI_LOCAL, LI_NONLOCAL)
    n_core, local, _ = get_ecp_params('ccECP', 3)
    assert local[0][0][0] == pytest.approx(3.5), 'user registration must win'
    _reset_key('ccECP', 3)

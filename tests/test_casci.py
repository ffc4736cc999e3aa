"""CASCI pretraining targets (pretrain/casci.py).

Oracles that do not rely on external quantum-chemistry packages:

- an active space of exactly the occupied HF orbitals has a single
  determinant, and its CASCI energy must equal the HF energy;
- full-space FCI is invariant under orthogonal rotations of the orbitals;
- roots are S^2 eigenstates with (near-)integer-spaced eigenvalues, and
  fix_spin filters the spin sector;
- correlation: E_CASCI <= E_HF, and energies are sorted ascending.
"""

import numpy as np
import pytest

from deepqmc_tpu.pretrain import compute_scf_solution
from deepqmc_tpu.pretrain.basis import build_basis
from deepqmc_tpu.pretrain.casci import _mo_eri, run_casci
from deepqmc_tpu.pretrain.scf import compute_integrals, run_hf


@pytest.fixture(scope='module')
def h2_problem(helpers):
    hamil = helpers.hamil(mol=helpers.mol('H2'))
    centers = np.asarray(hamil.mol.coords)
    charges = np.asarray(hamil.ns_valence)
    shells = build_basis(hamil.mol.charges, 'even-tempered')
    integrals = compute_integrals(centers, charges, shells)
    hf = run_hf(centers, charges, shells, hamil.n_up, hamil.n_down,
                integrals=integrals)
    h_mo = hf.mo_coeff.T @ integrals.Hcore @ hf.mo_coeff
    eri_mo = _mo_eri(integrals.eri, hf.mo_coeff)
    return hamil, integrals, hf, h_mo, eri_mo


def test_single_determinant_cas_reproduces_hf(h2_problem):
    hamil, integrals, hf, h_mo, eri_mo = h2_problem
    result = run_casci(h_mo, eri_mo, integrals.e_nuc, 1, 1, (1, 2))
    assert result.ci_coeffs.shape == (1, 1)
    np.testing.assert_allclose(result.energies[0], hf.e_tot, rtol=1e-9)


def test_casci_lowers_energy_and_orders_states(h2_problem):
    hamil, integrals, hf, h_mo, eri_mo = h2_problem
    result = run_casci(
        h_mo, eri_mo, integrals.e_nuc, 1, 1, (4, 2), n_states=3
    )
    assert result.energies[0] < hf.e_tot - 1e-4  # correlation energy
    assert np.all(np.diff(result.energies) >= -1e-10)
    # CI vectors are normalized
    np.testing.assert_allclose(
        (result.ci_coeffs**2).sum(axis=-1), 1.0, rtol=1e-10
    )


def test_fci_invariant_under_orbital_rotation(h2_problem):
    hamil, integrals, hf, h_mo, eri_mo = h2_problem
    n_mo = h_mo.shape[0]
    ncas = min(6, n_mo)
    e_hf_basis = run_casci(
        h_mo, eri_mo, integrals.e_nuc, 1, 1, (ncas, 2), n_states=2
    ).energies
    rng = np.random.default_rng(0)
    q, _ = np.linalg.qr(rng.normal(size=(ncas, ncas)))
    rot = np.eye(n_mo)
    rot[:ncas, :ncas] = q
    c_rot = hf.mo_coeff @ rot
    h_rot = c_rot.T @ integrals.Hcore @ c_rot
    eri_rot = _mo_eri(integrals.eri, c_rot)
    e_rot_basis = run_casci(
        h_rot, eri_rot, integrals.e_nuc, 1, 1, (ncas, 2), n_states=2
    ).energies
    np.testing.assert_allclose(e_rot_basis, e_hf_basis, atol=1e-8)


def test_spin_eigenstates_and_fix_spin(h2_problem):
    hamil, integrals, hf, h_mo, eri_mo = h2_problem
    # without spin filtering, the (2, 2) space holds singlets and a triplet
    all_states = run_casci(
        h_mo, eri_mo, integrals.e_nuc, 1, 1, (2, 2), n_states=4
    )
    s2_sorted = np.sort(np.round(all_states.s2, 6))
    np.testing.assert_allclose(s2_sorted, [0.0, 0.0, 0.0, 2.0], atol=1e-6)
    # fix_spin=0 keeps only singlets; energies interleave past the triplet
    singlets = run_casci(
        h_mo, eri_mo, integrals.e_nuc, 1, 1, (2, 2), n_states=3, fix_spin=0.0
    )
    np.testing.assert_allclose(singlets.s2, 0.0, atol=1e-6)
    assert singlets.energies[0] == pytest.approx(all_states.energies[0])
    # requesting more states than the sector holds raises
    with pytest.raises(ValueError):
        run_casci(
            h_mo, eri_mo, integrals.e_nuc, 1, 1, (2, 2), n_states=4,
            fix_spin=0.0,
        )


def test_compute_scf_solution_with_cas(helpers, tmp_path):
    hamil = helpers.hamil(mol=helpers.mol('H2'))
    scf = compute_scf_solution(
        [hamil.mol], hamil, n_states=2, cas=(2, 2), workdir=str(tmp_path)
    )
    confs = np.asarray(scf['confs'])
    conf_coeffs = np.asarray(scf['conf_coeffs'])
    assert confs.shape == (1, 2, 4, 2)  # [mol, state, det, n_el]
    assert conf_coeffs.shape == (1, 2, 4)
    # per state: determinants sorted by descending CI weight, distinct states
    weights = conf_coeffs**2
    assert np.all(np.diff(weights, axis=-1) <= 1e-12)
    assert not np.allclose(weights[0, 0], weights[0, 1])
    # the ground state is dominated by the HF determinant [0; 0]
    assert weights[0, 0, 0] > 0.9
    np.testing.assert_array_equal(confs[0, 0, 0], [0, 0])
    # checkpoint reuse path returns identical data
    scf2 = compute_scf_solution(
        [hamil.mol], hamil, n_states=2, cas=(2, 2), workdir=str(tmp_path)
    )
    np.testing.assert_array_equal(np.asarray(scf2['confs']), confs)
    np.testing.assert_allclose(
        np.asarray(scf2['conf_coeffs']), conf_coeffs, rtol=1e-12
    )

"""Radial-atom oracle: solver correctness and ECP-validation machinery.

The radial LDA solver (deepqmc_tpu/ecp/radial_atom.py) is the offline oracle
used to validate packaged ECP tables against all-electron valence physics
(scripts/verify_ecp_valence.py, scripts/fit_ecp_tables.py); these tests pin
its correctness against analytic and published values.
"""

import numpy as np
import pytest

from deepqmc_tpu.ecp.data import get_ecp_params
from deepqmc_tpu.ecp.radial_atom import (
    _log_grid,
    _solve_channel,
    ecp_channel_potentials,
    solve_atom,
)

GRID = {'rmin': 1e-6, 'rmax': 50.0, 'n_grid': 1500}


def test_hydrogenic_spectrum():
    """eps_nl = -Z^2/2n^2 for the pure Coulomb potential, all channels."""
    h, r = _log_grid(1e-6, 50.0, 1800)
    for z in (1, 8):
        for l in (0, 1):
            eps, u = _solve_channel(h, r, l, -z / r, 2)
            exact = [-(z**2) / (2.0 * n**2) for n in (l + 1, l + 2)]
            np.testing.assert_allclose(eps, exact, atol=5e-4 * z**2)
            # normalization: int u^2 dr = 1
            np.testing.assert_allclose((u**2 * r[:, None]).sum(axis=0) * h, 1.0)


def test_neon_lda_exchange_only_total_energy():
    """Known exchange-only LDA value (NIST DFT reference: -127.490740 Ha)."""
    sol = solve_atom(10, {0: [2, 2], 1: [6]}, rmin=1e-7, n_grid=2200)
    assert sol.converged
    assert abs(sol.e_total - (-127.4907)) < 2e-3


def test_ecp_atom_matches_ae_valence():
    """The golden-verified carbon ccECP reproduces AE valence eigenvalues.

    The ~20 mHa band is the intrinsic core-valence-exchange transferability
    error of a correct table at LDA level (calibrated in
    docs/evidence/ecp_valence_check.json); a corrupted Gaussian term moves
    eigenvalues by ~100 mHa (this is how the bad packaged N table was
    caught).
    """
    params = get_ecp_params('ccECP', 6)
    ae = solve_atom(6, {0: [2, 2], 1: [2]}, **GRID)
    pp = solve_atom(6, {0: [2], 1: [2]}, ecp_params=params, **GRID)
    assert ae.converged and pp.converged
    assert abs(pp.eigenvalues[(0, 0)] - ae.eigenvalues[(0, 1)]) < 0.02
    assert abs(pp.eigenvalues[(1, 0)] - ae.eigenvalues[(1, 0)]) < 0.02


def test_ecp_channel_potentials_match_local_potential_form():
    """Radial V_loc agrees with GaussianTypeECP.local_potential's formula."""
    params = get_ecp_params('ccECP', 6)
    r = np.linspace(0.3, 3.0, 7)
    v_loc, u_l, z_val = ecp_channel_potentials(r, 6, params)
    n_core, local, _ = params
    assert z_val == 6 - n_core
    expect = -z_val / r
    for cls, radial in zip(local, (1.0 / r, np.ones_like(r), r)):
        for alpha, beta in cls:
            expect = expect + beta * radial * np.exp(-alpha * r**2)
    np.testing.assert_allclose(v_loc, expect, rtol=1e-12)


def test_zero_valence_atom_is_empty():
    sol = solve_atom(3, {}, ecp_params=get_ecp_params('ccECP', 3), **GRID)
    assert sol.converged and sol.e_total == 0.0


@pytest.mark.slow
def test_fit_recovers_perturbed_carbon_table():
    """Methodology control: see scripts/fit_ecp_tables.py --check-recovery."""
    import copy

    from deepqmc_tpu.ecp.fit import fit_ecp_params

    params = copy.deepcopy(get_ecp_params('ccECP', 6))
    params[2][0][0][1] *= 1.3
    ae = solve_atom(6, {0: [2, 2], 1: [2]}, **GRID)
    eig = {(0, 0): ae.eigenvalues[(0, 1)], (1, 0): ae.eigenvalues[(1, 0)]}
    ion = solve_atom(6, {0: [2, 2], 1: [1]}, **GRID)
    probes = [({0: [2], 1: [1]}, ion.e_total - ae.e_total)]
    fitted, res = fit_ecp_params(
        6, params, {0: [2], 1: [2]}, eig, probes,
        grid_kwargs={'n_grid': 900, 'rmin': 1e-5},
    )
    assert np.all(np.abs(res) < 5e-3)


def test_spin_solver_restricted_limit():
    """Closed shells split evenly across spins must reproduce the
    restricted solver exactly (LSDA exchange reduces to LDA there)."""
    from deepqmc_tpu.ecp.radial_atom import solve_atom, solve_atom_spin

    restricted = solve_atom(4, {0: [2, 2]}, n_grid=900)
    spin, (up, down) = solve_atom_spin(4, {0: [1, 1]}, {0: [1, 1]}, n_grid=900)
    assert spin.converged
    assert abs(restricted.e_total - spin.e_total) < 1e-8
    for k, eps in restricted.eigenvalues.items():
        assert abs(up[k] - eps) < 1e-8
        assert abs(down[k] - eps) < 1e-8


def test_spin_solver_hund_polarization():
    """Open-shell N: majority-spin eigenvalues must lie below minority
    (exchange stabilizes the polarized channel)."""
    from deepqmc_tpu.ecp.radial_atom import solve_atom_spin

    sol, (up, down) = solve_atom_spin(
        7, {0: [1, 1], 1: [3]}, {0: [1, 1]}, n_grid=900
    )
    assert sol.converged
    assert up[(0, 1)] < down[(0, 1)]  # 2s up below 2s down

"""Refit Gaussian ECP parameters against all-electron valence physics.

Companion to :mod:`.radial_atom`: when a packaged table fails the AE-vs-ECP
valence check (scripts/verify_ecp_valence.py) and no external oracle exists
in this offline build, the free Gaussian parameters are re-optimized so the
ECP atom reproduces the all-electron exchange-only-LDA valence spectrum and
ionization-like total-energy differences.  The result is an *in-house,
LDA-consistent* potential — honestly labeled as such in tables/README.md,
not passed off as the published file.

Constrained structure (the ccECP functional form, gaussian_type_ecp.py:89):

- local r^-1 class: single term, coefficient pinned to Z_eff (cancels the
  -Z_eff/r divergence at the origin),
- local r^1 class: coefficient pinned to Z_eff * alpha(r^-1) (cancels the
  O(r) slope at the origin — the published tables obey this identity),
- everything else (exponents, the r^0 term, projector terms) free, with
  exponents parameterized in log space for positivity.

The fit is a damped least-squares over valence eigenvalue deviations and
Delta-E probe deviations, with a weak tether to the initial parameters so
under-determined directions stay near the published-structure starting
point.
"""

import numpy as np

from .radial_atom import solve_atom

__all__ = ['fit_ecp_params', 'pack_params', 'unpack_params']


def pack_params(local, nonlocal_):
    """Free-parameter vector theta from registry-layout ECP parameters."""
    (a_coul, _), = local[0]  # single r^-1 term; beta pinned to Z_eff
    (a_lin, _), = local[2]  # single r^1 term; beta pinned to Z_eff * a_coul
    theta = [np.log(a_coul), np.log(a_lin)]
    for alpha, beta in local[1]:
        theta += [np.log(alpha), beta]
    for chan in nonlocal_:
        for alpha, beta in chan:
            theta += [np.log(alpha), beta]
    return np.asarray(theta)


def unpack_params(theta, z_eff, n_const_terms, n_chan_terms):
    """Registry-layout (local, nonlocal) from the free-parameter vector."""
    a_coul, a_lin = np.exp(theta[0]), np.exp(theta[1])
    local = [[[a_coul, float(z_eff)]], [], [[a_lin, float(z_eff) * a_coul]]]
    i = 2
    for _ in range(n_const_terms):
        local[1].append([np.exp(theta[i]), theta[i + 1]])
        i += 2
    nonlocal_ = []
    for n_terms in n_chan_terms:
        chan = []
        for _ in range(n_terms):
            chan.append([np.exp(theta[i]), theta[i + 1]])
            i += 2
        nonlocal_.append(chan)
    return local, nonlocal_


def fit_ecp_params(
    z,
    init_params,
    val_occs,
    eig_targets,
    probe_targets,
    grid_kwargs=None,
    tether=0.03,
    verbose=False,
):
    """Least-squares refit of the free Gaussian parameters.

    ``eig_targets``: {(l, n_valence): eps_ae}; ``probe_targets``:
    [(occs_after_probe, delta_e_ae)].  Returns (params, final_residuals)
    with params in registry layout (n_core, local, nonlocal).
    """
    from scipy.optimize import least_squares

    n_core, local0, nonlocal0 = init_params
    z_eff = z - n_core
    n_const = len(local0[1])
    n_chan = [len(c) for c in nonlocal0]
    theta0 = pack_params(local0, nonlocal0)
    grid_kwargs = grid_kwargs or {'n_grid': 1100, 'rmin': 1e-5}
    warm = {}  # occupation signature -> converged density (warm starts)

    def _solve(occs, params):
        key = tuple(sorted((l, tuple(fs)) for l, fs in occs.items()))
        sol = solve_atom(
            z, occs, ecp_params=params, p_init=warm.get(key), **grid_kwargs
        )
        if sol.converged and sol.p_density is not None:
            warm[key] = sol.p_density
        return sol

    def residuals(theta):
        local, nonlocal_ = unpack_params(theta, z_eff, n_const, n_chan)
        params = (n_core, local, nonlocal_)
        base = _solve(val_occs, params)
        converged = bool(base.converged)
        res = [base.eigenvalues[k] - v for k, v in eig_targets.items()]
        for occs_after, d_ae in probe_targets:
            probe = _solve(occs_after, params)
            converged = converged and bool(probe.converged)
            res.append((probe.e_total - base.e_total) - d_ae)
        res.extend(tether * (theta - theta0))
        if not (converged and all(np.isfinite(res))):
            # theta-dependent penalty: a constant vector has a zero
            # finite-difference Jacobian, which stalls least_squares at the
            # infeasible point; growing with |theta - theta0| pushes it back
            res = [1e3 * (1.0 + float(np.linalg.norm(theta - theta0)))] * len(res)
        if verbose:
            devs = ', '.join(f'{r * 1e3:+.1f}' for r in res[: -len(theta0)])
            print(f'  devs [mHa]: {devs}', flush=True)
        return np.asarray(res)

    fit = least_squares(
        residuals, theta0, diff_step=1e-3, x_scale='jac', ftol=1e-12, xtol=1e-10
    )
    local, nonlocal_ = unpack_params(fit.x, z_eff, n_const, n_chan)
    return (n_core, local, nonlocal_), fit.fun[: len(eig_targets) + len(probe_targets)]

"""Oscillator strengths from logged local energies and wave-function ratios.

Post-hoc evaluation of the dipole-times-ratio estimator for transitions
between jointly-trained electronic states (same quantities as the
reference's oscillator_strength.py; the estimator is eq. 3-5 of the
excited-states paper cited there).  Built on a tiny first-order
error-propagation algebra over ``(mean, err)`` estimates so each physical
step — Monte Carlo averaging, products, powers — carries its uncertainty
explicitly.
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .types import Energy

__all__ = ['compute_oscillator_strength']


class Estimate(NamedTuple):
    """A value with its statistical uncertainty."""

    mean: jax.Array
    err: jax.Array

    @property
    def rel_err(self):
        return self.err / self.mean


def _mc_estimate(samples: jax.Array, axis: int, mask) -> Estimate:
    """Monte Carlo mean and standard error along ``axis``."""
    n = samples.shape[axis]
    return Estimate(
        jnp.mean(samples, axis=axis, where=mask),
        jnp.std(samples, axis=axis, where=mask) / jnp.sqrt(n),
    )


def _product(a: Estimate, b: Estimate) -> Estimate:
    """First-order error propagation through an elementwise product."""
    mean = a.mean * b.mean
    return Estimate(mean, jnp.abs(mean) * jnp.hypot(a.rel_err, b.rel_err))


def _sum_last(a: Estimate) -> Estimate:
    """Sum over the trailing axis; errors add in quadrature."""
    return Estimate(
        a.mean.sum(axis=-1), jnp.sqrt((a.err**2).sum(axis=-1))
    )


def compute_oscillator_strength(
    local_energies: Energy,
    ratios: jax.Array,
    rs: jax.Array,
    local_energies_mask: Optional[jax.Array] = None,
    ratios_mask: Optional[jax.Array] = None,
):
    """Oscillator strengths, transition dipole moments, excitation energies.

    Shapes: ``local_energies [state, walker]``, ``ratios
    [state, state, walker]`` (ratios[i, j] = psi_i/psi_j at samples of j),
    ``rs [state, walker, n_elec, 3]``.  Returns three ``(mean, err)`` pairs:
    oscillator strength, transition dipole norm, excitation energy, each of
    shape ``[state, state]``.
    """
    # pairwise excitation energies Delta_ij = E_j - E_i
    energy = _mc_estimate(local_energies, -1, local_energies_mask)
    excitation = Estimate(
        energy.mean[None, :] - energy.mean[:, None],
        jnp.hypot(energy.err[None, :], energy.err[:, None]),
    )

    # transition dipole matrix elements per Cartesian component:
    # D[i, j, a] = < (-sum_e r_e^a) * psi_i/psi_j >_{r ~ psi_j^2}
    dipole_samples = -rs.sum(axis=-2) * ratios[..., None]
    dipole = _mc_estimate(
        dipole_samples,
        -2,
        None if ratios_mask is None else ratios_mask[..., None],
    )

    # dipole strength S_ij = sum_a D_ij^a * D_ji^a and its square root,
    # the transition dipole moment
    strength = _sum_last(
        _product(dipole, Estimate(*map(lambda x: x.swapaxes(0, 1), dipole)))
    )
    tdm = Estimate(
        jnp.sqrt(strength.mean), 0.5 * jnp.sqrt(strength.mean) * strength.rel_err
    )

    # f_ij = 2/3 * Delta_ij * S_ij (error convention as in the reference:
    # the 2/3 prefactor enters the error once more through |f|)
    f_mean = (2 / 3) * excitation.mean * strength.mean
    oscillator = Estimate(
        f_mean,
        (2 / 3) * jnp.abs(f_mean) * jnp.hypot(excitation.rel_err, strength.rel_err),
    )
    return (
        (oscillator.mean, oscillator.err),
        (tdm.mean, tdm.err),
        (excitation.mean, excitation.err),
    )

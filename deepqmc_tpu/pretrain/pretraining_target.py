"""(MC-)SCF target orbitals for pretraining.

Reference: /root/reference/src/deepqmc/pretrain/pretraining_target.py.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.nn import one_hot

from .. import nn
from ..physics import pairwise_diffs
from .gto import GTOBasis

__all__ = ['PretrainTarget']


class PretrainTarget:
    """Evaluate baseline determinant orbitals at sampled configurations."""

    def __init__(self, hamil, n_determinants, centers, shells, mo_coeffs):
        self.n_determinants = n_determinants
        basis = nn.transform(lambda diffs: GTOBasis(centers, shells)(diffs))
        basis_params = basis.init(
            jax.random.PRNGKey(0),
            jnp.zeros((hamil.n_up + hamil.n_down, len(centers), 3 + 1)),
        )
        self.basis = partial(basis.apply, basis_params)
        self.mo_coeffs = mo_coeffs

    def __call__(self, confs, conf_coeffs, phys_conf):
        """confs/conf_coeffs: [n_mols, n_det, ...] (selected per sample via
        phys_conf.mol_idx); returns [n_det, n_elec, n_orb]."""
        i = phys_conf.mol_idx
        aos = self.basis(pairwise_diffs(phys_conf.r, phys_conf.R))
        mos = jnp.matmul(aos, self.mo_coeffs[i])
        dets = mos[:, confs[i]].swapaxes(0, 1)  # [n_det, n_elec, n_orb]
        factors = _fold_ci_coefficients(conf_coeffs[i], dets.shape[1])
        if self.n_determinants:
            dets = dets[: self.n_determinants]
            factors = factors[: self.n_determinants]
        return dets * factors[:, None, :]


def _fold_ci_coefficients(cc, n_el):
    """Spread each determinant's CI magnitude evenly over its orbitals and
    put the CI sign on the first orbital, so det(c^(1/n) * orbitals) = c * det."""
    on_first = one_hot(0, n_el)[None, :]
    signed_first = on_first * jnp.sign(cc)[:, None] + (1 - on_first)
    return (jnp.abs(cc) ** (1 / n_el))[:, None] * signed_first

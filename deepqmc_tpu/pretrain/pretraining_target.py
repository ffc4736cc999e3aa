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
        mol_idx = phys_conf.mol_idx
        diffs = pairwise_diffs(phys_conf.r, phys_conf.R)
        n_el = diffs.shape[-3]
        aos = self.basis(diffs)
        mos = jnp.matmul(aos, self.mo_coeffs[mol_idx])
        # [n_det, n_elec, n_orb]
        mos = mos[:, confs[mol_idx]].swapaxes(0, 1)
        if self.n_determinants:
            mos = mos[: self.n_determinants]
        # fold the CI coefficient of each determinant into its first orbital
        cc = conf_coeffs[mol_idx]
        factors = (jnp.abs(cc) ** (1 / n_el))[:, None] * (
            one_hot(0, n_el)[None, :] * jnp.sign(cc)[:, None]
            + (1 - one_hot(0, n_el)[None, :])
        )
        if self.n_determinants:
            factors = factors[: self.n_determinants]
        return mos * factors[:, None, :]

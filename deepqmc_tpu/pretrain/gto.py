"""JAX-side evaluation of Gaussian-type atomic orbitals.

Reference: /root/reference/src/deepqmc/pretrain/gto.py.  The normalization
matches :mod:`.integrals` exactly (shared convention), so SCF MO coefficients
contract directly with these AO values.
"""

from typing import Optional

import jax
import jax.numpy as jnp

from .. import nn
from ..utils import factorial2

__all__ = ['GTOBasis']


def get_cartesian_angulars(l: int):
    return [
        (lx, ly, l - lx - ly)
        for lx in range(l, -1, -1)
        for ly in range(l - lx, -1, -1)
    ]


class GTOShell(nn.Module):
    """One contracted cartesian GTO shell centered on a nucleus."""

    def __init__(self, l, coeffs, zetas, name: Optional[str] = None):
        super().__init__(name=name)
        zetas = jnp.asarray(zetas)
        self.ls = jnp.asarray(get_cartesian_angulars(l))
        self.anorms = 1.0 / jnp.sqrt(factorial2(2 * self.ls - 1).prod(axis=-1))
        self.rnorms = (2 * zetas / jnp.pi) ** (3 / 4) * (4 * zetas) ** (l / 2)
        self.coeffs = jnp.asarray(coeffs)
        self.zetas = nn.get_param('zetas', (len(zetas),), nn.array_init(zetas))

    def __call__(self, diffs):
        rs, rs_2 = diffs[..., :3], diffs[..., 3]
        angulars = jnp.power(rs[..., None, :], self.ls).prod(axis=-1)
        exps = self.rnorms * jnp.exp(-jnp.abs(self.zetas * rs_2[..., None]))
        radials = (self.coeffs * exps).sum(axis=-1)
        return self.anorms * angulars * radials[..., None]


class GTOBasis(nn.Module):
    """The full AO basis of a molecule, evaluated at electron positions."""

    def __init__(self, centers, shells, name: Optional[str] = None):
        super().__init__(name=name)
        self.centers = jnp.asarray(centers)
        self.shells = [
            (atom, GTOShell(l, coeff, zeta, name=f'gto_shell_atom{atom}_l{l}_{i}'))
            for i, (atom, (l, coeff, zeta)) in enumerate(shells)
        ]

    def __call__(self, diffs):
        """diffs: [n_elec, n_centers, 4] (difference vectors + squared norm)."""
        return jnp.concatenate(
            [shell(diffs[..., idx, :]) for idx, shell in self.shells], axis=-1
        )

"""JAX-side evaluation of Gaussian-type atomic orbitals.

Covers the same role as the reference's GTO evaluator
(/root/reference/src/deepqmc/pretrain/gto.py) with a TPU-first layout: the
ragged per-shell structure is flattened at construction into dense padded
tables (shells x primitives, AOs x angular powers), and the whole basis is
evaluated in ONE vectorized pass — no Python loop of per-shell modules, so
XLA sees a handful of large fused ops instead of ~n_shell small ones.

The normalization matches :mod:`.integrals` exactly (shared convention), so
SCF MO coefficients contract directly with these AO values.  Contraction
coefficients and exponents are trainable parameters initialized from the
basis-set values.
"""

from typing import Optional

import jax.numpy as jnp
import numpy as np

from .. import nn

__all__ = ['GTOBasis']


def _factorial2(n):
    """numpy double factorial with ``(-1)!! = 1`` (matches utils.factorial2)."""
    from scipy.special import gammaln

    n = np.asarray(n, float)
    gamma = np.exp(gammaln(n / 2 + 1))
    factor = np.where(n % 2, 2.0 ** (n / 2 + 0.5) / np.sqrt(np.pi), 2.0 ** (n / 2))
    return factor * gamma


def get_cartesian_angulars(l: int):
    """Cartesian monomial powers ``(lx, ly, lz)`` of one l-shell."""
    return [
        (lx, ly, l - lx - ly)
        for lx in range(l, -1, -1)
        for ly in range(l - lx, -1, -1)
    ]


class GTOBasis(nn.Module):
    """The full AO basis of a molecule, evaluated at electron positions.

    Args:
        centers: ``[n_centers, 3]`` nuclear coordinates.
        shells: list of ``(atom_idx, (l, coeffs, zetas))`` contracted shells.
    """

    def __init__(self, centers, shells, name: Optional[str] = None):
        super().__init__(name=name)
        self.centers = jnp.asarray(centers)

        # --- dense shell table: [n_shell, n_prim] zero-padded primitives ---
        n_prim = max(len(zetas) for _, (_, _, zetas) in shells)
        zeta_tab = np.ones((len(shells), n_prim))
        coeff_tab = np.zeros((len(shells), n_prim))
        ls, shell_centers = [], []
        for s, (atom, (l, coeffs, zetas)) in enumerate(shells):
            k = len(zetas)
            zeta_tab[s, :k] = zetas
            coeff_tab[s, :k] = coeffs
            ls.append(l)
            shell_centers.append(atom)

        # --- dense AO table: every cartesian component of every shell ------
        ao_powers, ao_shell = [], []
        for s, l in enumerate(ls):
            for powers in get_cartesian_angulars(l):
                ao_powers.append(powers)
                ao_shell.append(s)
        ao_powers = np.asarray(ao_powers)  # [n_ao, 3]

        self.ao_powers = jnp.asarray(ao_powers)
        self.ao_shell = jnp.asarray(ao_shell)  # [n_ao] -> shell idx
        self.shell_center = jnp.asarray(shell_centers)  # [n_shell] -> atom idx
        self.anorms = jnp.asarray(
            1.0 / np.sqrt(_factorial2(2 * ao_powers - 1).prod(axis=-1))
        )  # [n_ao]
        ls = np.asarray(ls)
        self.rnorms = jnp.asarray(
            (2 * zeta_tab / np.pi) ** (3 / 4) * (4 * zeta_tab) ** (ls[:, None] / 2)
        )  # [n_shell, n_prim]
        self.zetas = nn.get_param('zetas', zeta_tab.shape, nn.array_init(zeta_tab))
        self.coeffs = nn.get_param(
            'coeffs', coeff_tab.shape, nn.array_init(coeff_tab)
        )

    def __call__(self, diffs):
        """diffs: [n_elec, n_centers, 4] (difference vectors + squared norm).

        Returns AO values ``[n_elec, n_ao]``.
        """
        # radial part per shell: contract the padded primitive table
        r2 = diffs[..., self.shell_center, 3]  # [..., n_shell]
        exps = self.rnorms * jnp.exp(-jnp.abs(self.zetas * r2[..., None]))
        radials = (self.coeffs * exps).sum(axis=-1)  # [..., n_shell]
        # angular part per AO: monomials of the center-relative coordinates
        rs = diffs[..., self.shell_center[self.ao_shell], :3]  # [..., n_ao, 3]
        angulars = jnp.power(rs, self.ao_powers).prod(axis=-1)  # [..., n_ao]
        return self.anorms * angulars * radials[..., self.ao_shell]

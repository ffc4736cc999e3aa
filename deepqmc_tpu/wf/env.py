"""Exponential orbital envelopes.

Reference: /root/reference/src/deepqmc/wf/env.py.  The contraction
``(pi * exp(-|zeta| r)).sum(-1)`` is evaluated as one batched elementwise+
matmul pattern that XLA fuses; the reference's kfac-jax
``register_scale_and_shift`` (env.py:67) is unnecessary here because our KFAC
observes dense layers directly through nn instrumentation.
"""

from typing import Optional

import jax.numpy as jnp
from jax.nn import softplus

from .. import nn
from ..physics import pairwise_diffs
from ..utils import norm

__all__ = ()


class ExponentialEnvelopes(nn.Module):
    """Per-nucleus(-shell) exponential envelopes generating the orbitals.

    Args (reference env.py:10-30): ``isotropic`` selects scalar vs 3x3 zeta;
    ``per_shell`` adds one envelope per occupied shell; ``per_orbital_exponent``
    gives each orbital its own zeta; ``spin_restricted`` shares parameters
    between spin channels; ``init_to_ones`` initializes pi/zeta to one;
    ``softplus_zeta`` reparametrizes zeta through softplus.
    """

    def __init__(
        self,
        hamil,
        n_determinants,
        *,
        isotropic,
        per_shell,
        per_orbital_exponent,
        spin_restricted,
        init_to_ones,
        softplus_zeta,
        name: Optional[str] = None,
    ):
        super().__init__(name=name)
        shells = []
        for i, (z, n_shell, n_ecp_shell) in enumerate(
            zip(hamil.mol.charges, hamil.mol_shells, hamil.mol_ecp_shells)
        ):
            for k in range(n_ecp_shell, n_shell if per_shell else n_ecp_shell + 1):
                shells.append((i, z / (k + 1)))
        center_idx, zetas = zip(*shells)
        self.center_idx = jnp.array(center_idx)  # [n_env]
        zetas = jnp.array(zetas)
        self.isotropic = isotropic
        self.per_orbital_exponent = per_orbital_exponent
        self.spin_restricted = spin_restricted
        self.n_up = hamil.n_up
        self.n_det = n_determinants
        self.softplus_zeta = softplus_zeta
        n_orb = n_determinants * (hamil.n_up + hamil.n_down)
        n_env = len(self.center_idx)
        pi_init = (
            nn.ones_init()
            if init_to_ones
            else _ones_plus_variance_scaling()
        )
        self.pi = [
            nn.get_param(name_, (n_orb, n_env), pi_init)
            for name_ in (['pi'] if spin_restricted else ['pi_up', 'pi_down'])
        ]  # [n_orb, n_env]
        if per_orbital_exponent:
            zetas = jnp.tile(zetas[None], (n_orb, 1))  # [n_orb, n_env]
        if not isotropic:
            zetas = zetas[..., None, None] * jnp.eye(3)
        zeta_init = nn.ones_init() if init_to_ones else nn.array_init(zetas)
        self.zetas = [
            nn.get_param(name_, zetas.shape, zeta_init)
            for name_ in (['zetas'] if spin_restricted else ['zetas_up', 'zetas_down'])
        ]

    def _one_spin(self, zeta, pi, diffs):
        d = diffs[..., self.center_idx, :-1]  # [n_el, n_env, 3]
        if self.isotropic:
            d = norm(d, safe=True)  # [n_el, n_env]
            if self.per_orbital_exponent:
                d = d[:, None]  # [n_el, 1, n_env]
            exponent = softplus(zeta) * d if self.softplus_zeta else jnp.abs(zeta * d)
        else:
            exponent = norm(jnp.einsum('...ers,ies->i...er', zeta, d), safe=True)
        if not self.per_orbital_exponent:
            exponent = exponent[:, None]  # [n_el, 1, n_env]
        return (pi * jnp.exp(-exponent)).sum(axis=-1)  # [n_el, n_orb_flat]

    def __call__(self, phys_conf, nuc_params):
        """Flat orbital envelopes [n_el, n_det * n_orb], det-major columns.

        The flat layout (column d * n_orb + o is orbital o of determinant
        d; ``pi``'s rows are already in this order) keeps the minor tensor
        dims large on the whole determinant channel — see ops/slogdet.py
        ``slogdet_flat``.
        """
        diffs = pairwise_diffs(phys_conf.r, phys_conf.R)
        if self.spin_restricted:
            return self._one_spin(self.zetas[0], self.pi[0], diffs)
        orbs = [
            self._one_spin(zeta, pi, diff)
            for zeta, pi, diff in zip(
                self.zetas, self.pi, jnp.split(diffs, (self.n_up,))
            )
        ]
        return jnp.concatenate(orbs, axis=-2)


def _ones_plus_variance_scaling():
    vs = nn.variance_scaling(1.0)

    def init(shape, dtype):
        return jnp.ones(shape, dtype) + vs(shape, dtype)

    return init


class SimplifiedNucleusDependentEnvelopes(nn.Module):
    """Envelopes whose zeta (and optionally pi) come from a nuclear GNN head,
    enabling transferable wave functions (reference env.py:113-210)."""

    def __init__(
        self,
        hamil,
        n_determinants,
        *,
        n_envelope_per_nucleus,
        per_orbital_exponent,
        fixed_pi,
        name: Optional[str] = None,
    ):
        super().__init__(name=name)
        self.n_up = hamil.n_up
        self.n_env_per_nuc = n_envelope_per_nucleus
        self.n_nuc = len(hamil.mol.charges)
        self.n_orb = hamil.n_up + hamil.n_down
        self.n_det = n_determinants
        self.per_orbital_exponent = per_orbital_exponent
        self.fixed_pi = fixed_pi
        self.pis = tuple(
            jnp.ones((self.n_nuc, self.n_orb, self.n_det, self.n_env_per_nuc))
            for _ in range(2)
        )

    def _one_spin(self, zeta, pi, distance):
        # zeta/pi arrive [n_nuc(, n_orb), n_det, n_env]; reorder the
        # (parameter-sized) arrays determinant-major so the output columns
        # land in the flat [n_el, n_det * n_orb] layout directly
        pi = jnp.swapaxes(pi, 1, 2)  # [n_nuc, n_det, n_orb, n_env]
        if self.per_orbital_exponent:
            zeta = jnp.swapaxes(zeta, 1, 2)
            exponent = jnp.abs(distance * zeta)
        else:
            exponent = jnp.abs(distance * zeta)[:, :, :, None]
        # [n_el, n_nuc, n_det, n_orb, n_env] -> [n_el, n_det * n_orb]
        orbs = (pi * jnp.exp(-exponent)).sum(axis=(1, -1))
        return orbs.reshape(*orbs.shape[:-2], -1)

    def _reshape(self, zeta, orbital_dimension):
        shape = (
            (-1, self.n_orb, self.n_det, self.n_env_per_nuc)
            if orbital_dimension
            else (-1, self.n_det, self.n_env_per_nuc)
        )
        return zeta.reshape(shape)

    def __call__(self, phys_conf, nuc_params):
        diffs = pairwise_diffs(phys_conf.r, phys_conf.R)
        distance = jnp.tile(
            norm(diffs[:, :, :-1], safe=True)[:, :, None, None],
            (1, 1, self.n_det, self.n_env_per_nuc),
        )
        if self.per_orbital_exponent:
            # orbital axis inserted AFTER the determinant axis (det-major)
            distance = jnp.tile(
                distance[:, :, :, None], (1, 1, 1, self.n_orb, 1)
            )
        zeta_shape = (
            (self.n_nuc, self.n_orb, self.n_det, self.n_env_per_nuc)
            if self.per_orbital_exponent
            else (self.n_nuc, self.n_det, self.n_env_per_nuc)
        )
        if nuc_params is None:
            zetas = tuple(
                nn.get_param(name_, zeta_shape, nn.ones_init())
                for name_ in ('zetas_up', 'zetas_down')
            )
        else:
            zetas = tuple(
                self._reshape(nuc_params[k], self.per_orbital_exponent)
                for k in ('zetas_up', 'zetas_down')
            )
        if self.fixed_pi:
            pis = self.pis
        else:
            pis = tuple(
                self._reshape(nuc_params[k], True) for k in ('pis_up', 'pis_down')
            )
        return jnp.concatenate(
            [
                self._one_spin(zeta, pi, dist)
                for zeta, pi, dist in zip(
                    zetas, pis, jnp.split(distance, (self.n_up,))
                )
            ],
            axis=-2,
        )

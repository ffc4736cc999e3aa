"""Hellmann-Feynman force estimators.

Reference: /root/reference/src/deepqmc/force.py.  Five estimators: the bare
Coulomb force plus the antithetic-coordinate zero-variance (zv), zero-
variance-zero-bias (zvzb) and Q-function (zvq/zvzbq) variants.
"""

from collections.abc import Callable

import jax
import jax.numpy as jnp

from .hamil import MolecularHamiltonian
from .physics import coulomb_force
from .types import Energy, ParametrizedWaveFunction, Params, PhysicalConfiguration, Psi

__all__ = ()


def make_grad_nuc_wf(
    wf: ParametrizedWaveFunction, i=None, j=None
) -> Callable[[Params, PhysicalConfiguration], Psi]:
    """d psi / d R_ij as a wave-function-like (sign, log) pair."""
    i = slice(None) if i is None else i
    j = slice(None) if j is None else j

    def grad_nuc_wf(params: Params, phys_conf: PhysicalConfiguration) -> Psi:
        def _wf(R):
            psi = wf(params, phys_conf.replace(R=R))
            return psi.sign * jnp.exp(psi.log)

        grad_psi = jax.grad(_wf)(phys_conf.R)[i, j]
        return Psi(jnp.sign(grad_psi), jnp.log(jnp.abs(grad_psi)))

    return grad_nuc_wf


def make_grad_nuc_log_wf(wf: ParametrizedWaveFunction):
    """d log|psi| / d R."""

    def grad_nuc_log_wf(params: Params, phys_conf: PhysicalConfiguration):
        def _wf(R):
            return wf(params, phys_conf.replace(R=R)).log

        return jax.grad(_wf)(phys_conf.R)

    return grad_nuc_log_wf


def make_grad_log_wf(wf: ParametrizedWaveFunction):
    """d log|psi| / d r."""

    def grad_log_wf(params: Params, phys_conf: PhysicalConfiguration):
        def _wf(r):
            return wf(params, phys_conf.replace(r=r)).log

        return jax.grad(_wf)(phys_conf.r)

    return grad_log_wf


def Q(r: jax.Array, R: jax.Array, c: jax.Array) -> jax.Array:
    """The Q function of [Assaraf & Caffarel, 10.1063/1.1621615]."""
    dists = r[None] - R[:, None]
    force = c[:, None, None] * dists / jnp.linalg.norm(dists, axis=-1, keepdims=True)
    return force.sum(-2)


def evaluate_hf_force_bare(hamil: MolecularHamiltonian):
    """Bare (high-variance) Coulomb estimator of the HF force."""
    charges_nuc = hamil.mol.charges
    charges_elec = -jnp.ones(hamil.n_up + hamil.n_down)

    def bare(params: Params, phys_conf: PhysicalConfiguration) -> jax.Array:
        force_nuc = coulomb_force(
            phys_conf.R, phys_conf.R, charges_nuc, charges_nuc, True
        )
        force_elec = coulomb_force(phys_conf.R, phys_conf.r, charges_nuc, charges_elec)
        return force_nuc + force_elec

    return bare


def evaluate_hf_force_ac_zv(hamil: MolecularHamiltonian, wf: ParametrizedWaveFunction):
    """Antithetic-coordinate zero-variance estimator [10.1063/5.0052266]."""
    n_nuc = len(hamil.mol.coords)
    bare = evaluate_hf_force_bare(hamil)

    def zv(params: Params, phys_conf: PhysicalConfiguration) -> jax.Array:
        f_bare = bare(params, phys_conf)
        grad_log_psi = make_grad_nuc_log_wf(wf)(params, phys_conf)
        e_loc, _ = hamil.local_energy(wf)(None, params, phys_conf)

        def local_energy_grad_wf_i(i, val):
            # rng=None: force estimators are not implemented for ECPs
            eloc_ij, _ = hamil.local_energy(make_grad_nuc_wf(wf, i // 3, i % 3))(
                None, params, phys_conf
            )
            return val.at[i // 3, i % 3].set(eloc_ij)

        e_loc_grad_psi = jax.lax.fori_loop(
            0, n_nuc * 3, local_energy_grad_wf_i, jnp.zeros_like(phys_conf.R)
        )
        return f_bare - (e_loc_grad_psi - e_loc) * grad_log_psi

    return zv


def evaluate_hf_force_ac_zvzb(
    hamil: MolecularHamiltonian, wf: ParametrizedWaveFunction
):
    """Zero-variance zero-bias estimator [10.1063/5.0052266]."""

    def zvzb(
        params: Params, phys_conf: PhysicalConfiguration, e_loc: Energy, energy: Energy
    ) -> jax.Array:
        f_zv = evaluate_hf_force_ac_zv(hamil, wf)(params, phys_conf)
        grad_nuc_log_psi = make_grad_nuc_log_wf(wf)(params, phys_conf)
        f_zb = -2 * (e_loc - energy)[None, None] * grad_nuc_log_psi
        return f_zv + f_zb

    return zvzb


def evaluate_hf_force_ac_zvq(hamil: MolecularHamiltonian, wf: ParametrizedWaveFunction):
    """Q-function zero-variance estimator [10.1063/1.1621615]."""

    def zvq(params: Params, phys_conf: PhysicalConfiguration) -> jax.Array:
        grad_Q = jax.jacfwd(Q)(phys_conf.r, phys_conf.R, hamil.mol.charges)
        grad_log_psi = make_grad_log_wf(wf)(params, phys_conf)
        force_nuc = coulomb_force(
            phys_conf.R, phys_conf.R, hamil.mol.charges, hamil.mol.charges, True
        )
        return (grad_log_psi[None, None] * grad_Q).sum((-1, -2)) + force_nuc

    return zvq


def evaluate_hf_force_ac_zvzbq(
    hamil: MolecularHamiltonian, wf: ParametrizedWaveFunction
):
    """Q-function zero-variance zero-bias estimator [10.1063/1.1621615]."""

    def zvzbq(
        params: Params, phys_conf: PhysicalConfiguration, e_loc: Energy, energy: Energy
    ) -> jax.Array:
        f_zv = evaluate_hf_force_ac_zvq(hamil, wf)(params, phys_conf)
        f_zb = (
            -2
            * (e_loc - energy)[None, None]
            * Q(phys_conf.r, phys_conf.R, hamil.mol.charges)
        )
        return f_zv + f_zb

    return zvzbq

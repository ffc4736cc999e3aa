"""Hellmann-Feynman force estimators.

Implements the same five estimators as the reference
(/root/reference/src/deepqmc/force.py — bare Coulomb, antithetic-coordinate
zero-variance zv/zvzb [10.1063/5.0052266], and Q-function zvq/zvzbq
[10.1063/1.1621615]) with a TPU-first internal organization:

- nuclear derivatives of the wave function are *directional* tangents taken
  in log-space with ``jax.jvp`` (the derivative of ``log|psi|`` composes as
  ``log|d psi| = log|psi| + log|t|`` — no exponentiation of ``log|psi|``);
- the 3M per-coordinate derivative local energies of the zv estimator are
  one ``vmap`` over the coordinate basis instead of a sequential
  ``fori_loop`` — batched work the MXU can tile;
- the Q-function zero-variance term contracts ``grad_r log|psi|`` against
  ``grad_r Q`` as a single ``jvp`` instead of materializing the
  ``[n_nuc, 3, n_elec, 3]`` Jacobian.
"""

from collections.abc import Callable

import jax
import jax.numpy as jnp

from .hamil import MolecularHamiltonian
from .physics import coulomb_force
from .types import Energy, ParametrizedWaveFunction, Params, PhysicalConfiguration, Psi

__all__ = ()


def nuclear_log_tangent(
    wf: ParametrizedWaveFunction,
    params: Params,
    phys_conf: PhysicalConfiguration,
    direction: jax.Array,
) -> jax.Array:
    """Directional derivative ``d log|psi| / d R . direction``."""
    log_of_R = lambda R: wf(params, phys_conf.replace(R=R)).log
    return jax.jvp(log_of_R, (phys_conf.R,), (direction,))[1]


def grad_nuc_log_psi(
    wf: ParametrizedWaveFunction, params: Params, phys_conf: PhysicalConfiguration
) -> jax.Array:
    """``d log|psi| / d R`` as a ``[n_nuc, 3]`` array."""
    log_of_R = lambda R: wf(params, phys_conf.replace(R=R)).log
    return jax.grad(log_of_R)(phys_conf.R)


def directional_grad_wf(
    wf: ParametrizedWaveFunction, direction: jax.Array
) -> Callable[[Params, PhysicalConfiguration], Psi]:
    """The wave function ``direction . d psi / d R`` as a (sign, log) pair.

    With ``t = direction . d log|psi| / d R`` the derivative factorizes as
    ``d psi = psi * t``, so the log-representation composes additively and
    ``psi`` itself is never exponentiated.
    """

    def dwf(params: Params, phys_conf: PhysicalConfiguration) -> Psi:
        psi, t = jax.jvp(
            lambda R: wf(params, phys_conf.replace(R=R)),
            (phys_conf.R,),
            (direction,),
        )
        return Psi(psi.sign * jnp.sign(t.log), psi.log + jnp.log(jnp.abs(t.log)))

    return dwf


def Q(r: jax.Array, R: jax.Array, c: jax.Array) -> jax.Array:
    """The Q function of [Assaraf & Caffarel, 10.1063/1.1621615]."""
    c = jnp.asarray(c)
    dists = r[None] - R[:, None]
    force = c[:, None, None] * dists / jnp.linalg.norm(dists, axis=-1, keepdims=True)
    return force.sum(-2)


def evaluate_hf_force_bare(hamil: MolecularHamiltonian):
    """Bare (high-variance) Coulomb estimator of the HF force."""
    charges_nuc = jnp.asarray(hamil.mol.charges)
    charges_elec = -jnp.ones(hamil.n_up + hamil.n_down)

    def bare(params: Params, phys_conf: PhysicalConfiguration) -> jax.Array:
        force_nuc = coulomb_force(
            phys_conf.R, phys_conf.R, charges_nuc, charges_nuc, True
        )
        force_elec = coulomb_force(phys_conf.R, phys_conf.r, charges_nuc, charges_elec)
        return force_nuc + force_elec

    return bare


def _force_direction_chunk() -> int:
    """Coordinate-direction chunk for the zv estimator (0 = all at once).

    Each of the 3M directions costs a full forward-Laplacian local energy;
    the unchunked vmap materializes all 3M concurrently (advisor r4: peak
    memory ~3M x the single-eval footprint, can OOM where the reference's
    sequential fori_loop fit).  A chunk keeps MXU batching within blocks
    while ``lax.map`` sequences the blocks.
    """
    import os

    return int(os.environ.get('DEEPQMC_TPU_FORCE_DIRECTION_CHUNK', '6'))


def evaluate_hf_force_ac_zv(hamil: MolecularHamiltonian, wf: ParametrizedWaveFunction):
    """Antithetic-coordinate zero-variance estimator [10.1063/5.0052266]."""
    n_coord = 3 * len(hamil.mol.coords)
    bare = evaluate_hf_force_bare(hamil)

    def zv(params: Params, phys_conf: PhysicalConfiguration) -> jax.Array:
        R_shape = phys_conf.R.shape
        f_bare = bare(params, phys_conf)
        grad_log_psi = grad_nuc_log_psi(wf, params, phys_conf)
        e_loc, _ = hamil.local_energy(wf)(None, params, phys_conf)

        def eloc_of_direction(e):
            # rng=None: force estimators are not implemented for ECPs
            dwf = directional_grad_wf(wf, e.reshape(R_shape))
            eloc_e, _ = hamil.local_energy(dwf)(None, params, phys_conf)
            return eloc_e

        # batched passes over the 3M coordinate directions, in bounded chunks
        chunk = _force_direction_chunk()
        size = (
            max(d for d in range(1, min(chunk, n_coord) + 1) if n_coord % d == 0)
            if chunk
            else n_coord
        )
        eye = jnp.eye(n_coord)
        if size == n_coord:
            e_loc_grad_psi = jax.vmap(eloc_of_direction)(eye)
        else:
            e_loc_grad_psi = jax.lax.map(
                jax.vmap(eloc_of_direction),
                eye.reshape(n_coord // size, size, n_coord),
            ).reshape(n_coord)
        return f_bare - (e_loc_grad_psi.reshape(R_shape) - e_loc) * grad_log_psi

    return zv


def evaluate_hf_force_ac_zvq(hamil: MolecularHamiltonian, wf: ParametrizedWaveFunction):
    """Q-function zero-variance estimator [10.1063/1.1621615]."""
    charges = jnp.asarray(hamil.mol.charges)

    def zvq(params: Params, phys_conf: PhysicalConfiguration) -> jax.Array:
        grad_log_psi = jax.grad(
            lambda r: wf(params, phys_conf.replace(r=r)).log
        )(phys_conf.r)
        # sum_i grad_{r_i} log|psi| . grad_{r_i} Q == jvp of Q along the force
        zv_term = jax.jvp(
            lambda r: Q(r, phys_conf.R, charges), (phys_conf.r,), (grad_log_psi,)
        )[1]
        force_nuc = coulomb_force(phys_conf.R, phys_conf.R, charges, charges, True)
        return zv_term + force_nuc

    return zvq


def _with_zero_bias(zv_factory, grad_fn):
    """Extend a ZV estimator with the ZB term ``-2 (E_loc - E) * g``.

    ``grad_fn(params, phys_conf) -> [n_nuc, 3]`` supplies the estimator's
    derivative field (``d log|psi| / d R`` for zvzb, ``Q`` for zvzbq).
    """

    def zvzb(
        params: Params, phys_conf: PhysicalConfiguration, e_loc: Energy, energy: Energy
    ) -> jax.Array:
        f_zv = zv_factory(params, phys_conf)
        return f_zv - 2 * (e_loc - energy) * grad_fn(params, phys_conf)

    return zvzb


def evaluate_hf_force_ac_zvzb(
    hamil: MolecularHamiltonian, wf: ParametrizedWaveFunction
):
    """Zero-variance zero-bias estimator [10.1063/5.0052266]."""
    return _with_zero_bias(
        evaluate_hf_force_ac_zv(hamil, wf),
        lambda params, phys_conf: grad_nuc_log_psi(wf, params, phys_conf),
    )


def evaluate_hf_force_ac_zvzbq(
    hamil: MolecularHamiltonian, wf: ParametrizedWaveFunction
):
    """Q-function zero-variance zero-bias estimator [10.1063/1.1621615]."""
    charges = jnp.asarray(hamil.mol.charges)
    return _with_zero_bias(
        evaluate_hf_force_ac_zvq(hamil, wf),
        lambda params, phys_conf: Q(phys_conf.r, phys_conf.R, charges),
    )

"""Physics kernels: pairwise geometry, Coulomb terms, Laplacians, spin.

Reference: /root/reference/src/deepqmc/physics.py.  TPU notes:

- :func:`loop_laplacian` keeps the reference's nested-autodiff formulation
  (physics.py:101-113) as the correctness baseline; the production default is
  the forward-Laplacian engine in :mod:`deepqmc_tpu.fwdlap`, which replaces 3N
  sequential JVP-of-gradient passes with one batched forward propagation whose
  Jacobian channel rides the MXU.
- :func:`evaluate_spin` batches the n_up*n_down spin-swapped wave-function
  evaluations with ``vmap`` instead of the reference's double ``fori_loop``
  (physics.py:116-144): the TPU wants one large batched network evaluation,
  not a sequential scalar loop.
"""

from collections.abc import Callable
from typing import Optional, Protocol

import jax
import jax.numpy as jnp

from .types import (
    Energy,
    KeyArray,
    ParametrizedWaveFunction,
    Params,
    PhysicalConfiguration,
    WaveFunction,
)
from .utils import norm, triu_flat

__all__ = ()


class Potential(Protocol):
    """Protocol for (effective core) potentials acting on the electrons."""

    def local_potential(self, phys_conf: PhysicalConfiguration) -> Energy: ...

    def nonloc_potential(
        self,
        rng: Optional[KeyArray],
        phys_conf: PhysicalConfiguration,
        wf: WaveFunction,
    ) -> Energy: ...


def _cross_displacements(senders: jax.Array, receivers: jax.Array) -> jax.Array:
    """[..., i, j, 3] displacement grid between two particle sets."""
    return senders[..., :, None, :] - receivers[..., None, :, :]


def pairwise_distance(coords1: jax.Array, coords2: jax.Array) -> jax.Array:
    return jnp.linalg.norm(_cross_displacements(coords1, coords2), axis=-1)


def pairwise_diffs(coords1: jax.Array, coords2: jax.Array) -> jax.Array:
    """Difference vectors with the squared norm appended as a 4th channel."""
    d = _cross_displacements(coords1, coords2)
    return jnp.concatenate([d, (d**2).sum(axis=-1, keepdims=True)], axis=-1)


def pairwise_self_distance(coords: jax.Array, full: bool = False) -> jax.Array:
    """Distances between distinct particles of one set, flat i<j or full matrix."""
    i, j = jnp.triu_indices(coords.shape[-2], k=1)
    d = _cross_displacements(coords, coords)
    flat = norm(d[..., i, j, :], safe=True, axis=-1)
    if not full:
        return flat
    square = jnp.zeros(d.shape[:-1])
    return square.at[..., i, j].set(flat).at[..., j, i].set(flat)


def nuclear_energy(phys_conf: PhysicalConfiguration, ns_valence: jax.Array) -> Energy:
    ns_valence = jnp.asarray(ns_valence)  # may arrive as host-side numpy
    pair_charges = triu_flat(ns_valence[:, None] * ns_valence)
    return (pair_charges / pairwise_self_distance(phys_conf.R)).sum()


def electronic_potential(phys_conf: PhysicalConfiguration) -> Energy:
    return (1 / pairwise_self_distance(phys_conf.r)).sum(axis=-1)


class NuclearCoulombPotential:
    """All-electron Coulomb potential -sum_I Z_I / r_iI."""

    def __init__(self, charges: jax.Array):
        self.charges = charges
        self.ns_valence = charges

    def local_potential(self, phys_conf: PhysicalConfiguration) -> Energy:
        dists = pairwise_distance(phys_conf.r, phys_conf.R)
        return -(jnp.asarray(self.charges) / dists).sum(axis=(-1, -2))

    def nonloc_potential(
        self,
        rng: Optional[KeyArray],
        phys_conf: PhysicalConfiguration,
        wf: WaveFunction,
    ) -> Energy:
        return jnp.array(0.0)


def loop_laplacian(
    f: Callable[[jax.Array], jax.Array],
) -> Callable[[jax.Array], tuple[jax.Array, jax.Array]]:
    """Nested-autodiff Laplacian: fori_loop of JVPs of the gradient.

    Correctness baseline, matching the reference default (physics.py:101-113).
    """

    def lap(x: jax.Array) -> tuple[jax.Array, jax.Array]:
        n_coord = len(x)
        grad_f = jax.grad(f)
        df, grad_f_jvp = jax.linearize(grad_f, x)
        eye = jnp.eye(n_coord, dtype=x.dtype)
        d2f_sum = jax.lax.fori_loop(
            0, n_coord, lambda i, val: val + grad_f_jvp(eye[i])[i], jnp.zeros((), x.dtype)
        )
        return d2f_sum, df

    return lap


# the reference exposes this simply as `laplacian`
laplacian = loop_laplacian


def vmap_laplacian(
    f: Callable[[jax.Array], jax.Array],
) -> Callable[[jax.Array], tuple[jax.Array, jax.Array]]:
    """Hessian-diagonal via one vmapped JVP batch (more MXU-friendly than the
    sequential loop, at the cost of 3N x memory)."""

    def lap(x: jax.Array) -> tuple[jax.Array, jax.Array]:
        n_coord = len(x)
        grad_f = jax.grad(f)
        df, grad_f_jvp = jax.linearize(grad_f, x)
        eye = jnp.eye(n_coord, dtype=x.dtype)
        diag = jax.vmap(lambda v: (grad_f_jvp(v) * v).sum())(eye)
        return diag.sum(), df

    return lap


def evaluate_spin(
    hamil, wf: ParametrizedWaveFunction
) -> Callable[[Params, PhysicalConfiguration], jax.Array]:
    """Local S^2 estimator via opposite-spin pair swaps (batched).

    S^2_loc = S_z(S_z+1) + n_down - sum_{ij} psi(P_ij r) / psi(r), with P_ij
    exchanging up-electron i and down-electron j (reference physics.py:116-144).
    """
    n_up, n_down = hamil.n_up, hamil.n_down

    def evaluate_spin_(params: Params, phys_conf: PhysicalConfiguration) -> jax.Array:
        na, nb = max(n_up, n_down), min(n_up, n_down)
        s2_base = (na - nb) / 2 * ((na - nb) / 2 + 1) + nb
        psi = wf(params, phys_conf)
        if nb == 0:
            return jnp.asarray(s2_base)
        r = phys_conf.r

        def swapped_psi(i, j):
            # exchange up electron i (index i) and down electron j (index n_up + j)
            r_swap = r.at[i].set(r[n_up + j]).at[n_up + j].set(r[i])
            return wf(params, phys_conf.replace(r=r_swap))

        ii, jj = jnp.meshgrid(jnp.arange(n_up), jnp.arange(n_down), indexing='ij')
        psi_perm = jax.vmap(swapped_psi)(ii.reshape(-1), jj.reshape(-1))
        ratios = psi.sign * psi_perm.sign * jnp.exp(psi_perm.log - psi.log)
        return s2_base - ratios.sum()

    return evaluate_spin_


def coulomb_force(
    r1: jax.Array,
    r2: jax.Array,
    c1: jax.Array,
    c2: jax.Array,
    remove_self_int: bool = False,
) -> jax.Array:
    """Coulomb force on particles ``r1`` due to particles ``r2``."""
    d = r1[:, None] - r2[None]
    pair_force = (
        (c1[:, None] * c2[None])[..., None]
        * d
        / jnp.linalg.norm(d, axis=-1, keepdims=True) ** 3
    )
    if remove_self_int:
        diag = (jnp.arange(len(r1)), jnp.arange(len(r2)))
        pair_force = pair_force.at[diag].set(0)
    return pair_force.sum(-2)

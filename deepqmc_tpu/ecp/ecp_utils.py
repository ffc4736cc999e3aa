"""Icosahedral quadrature geometry for the nonlocal ECP projection.

Reference: /root/reference/src/deepqmc/ecp/ecp_utils.py.  The 12-point
icosahedron quadrature (Li et al. 2022) integrates spherical harmonics
exactly up to l = 5; a random azimuthal rotation decorrelates the residual
quadrature error across Monte Carlo samples.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..types import PhysicalConfiguration

__all__ = ()


@jax.vmap
def sph2cart(sph, r=1):
    theta, phi = sph[0], sph[1]
    rsin = r * jnp.sin(theta)
    return jnp.array([rsin * jnp.cos(phi), rsin * jnp.sin(phi), r * jnp.cos(theta)])


def rot_y(theta):
    zero, one = jnp.zeros_like(theta), jnp.ones_like(theta)
    return jnp.array(
        [
            [jnp.cos(theta), zero, jnp.sin(theta)],
            [zero, one, zero],
            [-jnp.sin(theta), zero, jnp.cos(theta)],
        ]
    )


def rot_z(phi):
    zero, one = jnp.zeros_like(phi), jnp.ones_like(phi)
    return jnp.array(
        [
            [jnp.cos(phi), -jnp.sin(phi), zero],
            [jnp.sin(phi), jnp.cos(phi), zero],
            [zero, zero, one],
        ]
    )


def get_unit_icosahedron_sph():
    """The 12 icosahedron vertices in spherical coordinates [theta, phi]."""
    verts = [[0.0, 0.0], [math.pi, 0.0]]
    for j in range(5):
        verts.append([math.atan(2), math.pi / 5 * 2 * j])
        verts.append([math.pi - math.atan(2), math.pi / 5 * (2 * j - 1)])
    # numpy: callers use this at construction time or as a traced constant
    return np.array(verts)


def get_quadrature_points(rng, nucleus_position, phys_conf: PhysicalConfiguration):
    """All-electron configurations with one electron rotated to each vertex.

    Returns a PhysicalConfiguration batch of shape (N, 12, N, 3): for each
    reference electron i, 12 configurations where electron i is moved to the
    icosahedron vertices on its sphere around the nucleus (with a shared
    random azimuthal rotation per electron), all other electrons unchanged.
    """
    N = len(phys_conf)
    rel = phys_conf.r - nucleus_position
    norm = jnp.linalg.norm(rel, axis=-1)
    theta = jnp.arccos(jnp.clip(rel[..., 2] / norm, -1.0, 1.0))
    phi = jnp.arctan2(rel[..., 1], rel[..., 0])
    phi_random = jax.random.uniform(rng, phi.shape, minval=0, maxval=jnp.pi / 5)

    # rotation mapping the z-axis vertex onto each electron's direction
    rot = (
        jnp.moveaxis(rot_z(phi), -1, -3)
        @ jnp.moveaxis(rot_y(theta), -1, -3)
        @ jnp.moveaxis(rot_z(phi_random), -1, -3)
    )  # [N, 3, 3]
    vertices = sph2cart(get_unit_icosahedron_sph())  # [12, 3]
    # [N, 12, 3]: vertex positions on each electron's sphere
    rotated = norm[:, None, None] * jnp.einsum('nab,vb->nva', rot, vertices)
    rotated = rotated + nucleus_position

    # scatter: configuration (i, v) equals r with electron i at rotated[i, v]
    base = jnp.broadcast_to(phys_conf.r, (N, 12, N, 3))
    is_moved = jnp.eye(N, dtype=bool)[:, None, :, None]  # [N, 1, N, 1]
    quadrature_rs = jnp.where(is_moved, rotated[:, :, None, :], base)
    return PhysicalConfiguration(
        jnp.broadcast_to(phys_conf.R, (N, 12, *phys_conf.R.shape)),
        quadrature_rs,
        jnp.broadcast_to(phys_conf.mol_idx, (N, 12)),
    )


def pad_list_of_3D_arrays_to_one_array(arrays):
    """Zero-pad 3D arrays to a common shape and stack them (numpy)."""
    arrays = [np.asarray(a) for a in arrays]
    target = np.array([a.shape for a in arrays]).max(axis=0)
    return np.array(
        [
            np.pad(a, [(0, int(target[i]) - a.shape[i]) for i in range(3)])
            for a in arrays
        ]
    )

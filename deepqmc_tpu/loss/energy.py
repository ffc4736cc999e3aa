"""Batched local energies and the VMC energy gradient estimator terms.

Reference: /root/reference/src/deepqmc/loss/energy.py.
"""

import os

import jax

from ..parallel import all_device_mean
from ..types import Energy, KeyArray, Params, PhysicalConfiguration, Stats, Weight
from ..utils import masked_mean

__all__ = ()


def _eloc_walker_chunk() -> int:
    """Walker-axis chunk for the local-energy evaluation (0 = whole batch).

    The forward-Laplacian Jacobian channel scales as [walkers, 3N, ...] —
    for large molecules (benzene: N=42, 3N+1=127 directions) the whole-batch
    vmap materializes multi-GB intermediates in HBM.  Chunking trades one
    sequential lax.map level for a bounded footprint; the local energy is
    never differentiated (the VMC estimator pulls gradients through a
    separate log|psi| vjp, loss_function.py), so the map adds no tape cost.
    """
    return int(os.environ.get('DEEPQMC_TPU_ELOC_WALKER_CHUNK', '0'))


def _chunked_walker_vmap(f, chunk):
    """vmap ``f`` over the walker axis in sequential chunks of ``chunk``."""

    def run(keys, params, phys_conf):
        batch = keys.shape[0]
        size = max(
            d for d in range(1, min(chunk, batch) + 1) if batch % d == 0
        )
        if size == batch:
            return jax.vmap(f, (0, None, 0))(keys, params, phys_conf)
        resh = lambda x: x.reshape(batch // size, size, *x.shape[1:])
        out = jax.lax.map(
            lambda kc: jax.vmap(f, (0, None, 0))(kc[0], params, kc[1]),
            (resh(keys), jax.tree_util.tree_map(resh, phys_conf)),
        )
        return jax.tree_util.tree_map(
            lambda x: x.reshape(batch, *x.shape[2:]), out
        )

    return run


def compute_local_energy(
    rng: KeyArray,
    hamil,
    wf,
    params: Params,
    phys_conf: PhysicalConfiguration,
) -> tuple[Energy, Stats]:
    """Local energies over the [molecule, state, walker] batch grid."""
    eloc_of = hamil.local_energy(wf)
    chunk = _eloc_walker_chunk()
    over_walkers = (
        _chunked_walker_vmap(eloc_of, chunk)
        if chunk
        else jax.vmap(eloc_of, (0, None, 0))
    )
    over_states = jax.vmap(over_walkers)
    over_molecules = jax.vmap(over_states, (0, None, 0))
    keys = jax.random.split(rng, phys_conf.batch_shape)
    local_energy, hamil_stats = over_molecules(keys, params, phys_conf)
    return local_energy, jax.tree_util.tree_map(
        lambda x: x.mean(axis=-1), hamil_stats
    )


def compute_mean_energy(local_energy: Energy, weight: Weight) -> tuple[Energy, Stats]:
    return all_device_mean(local_energy * weight), {}


def compute_mean_energy_tangent(
    local_energy: Energy,
    weight: Weight,
    log_psi_tangent: jax.Array,
    gradient_mask: jax.Array,
) -> jax.Array:
    """Control-variate VMC gradient: E[(E_loc - E_mean) * dlogpsi * w]."""
    baseline = all_device_mean(local_energy * weight, axis=-1, keepdims=True)
    score_times_dev = (local_energy - baseline) * log_psi_tangent * weight
    return masked_mean(score_times_dev, gradient_mask)

"""Batched local energies and the VMC energy gradient estimator terms.

Reference: /root/reference/src/deepqmc/loss/energy.py.
"""

import jax

from ..parallel import all_device_mean
from ..types import Energy, KeyArray, Params, PhysicalConfiguration, Stats, Weight
from ..utils import masked_mean

__all__ = ()


def compute_local_energy(
    rng: KeyArray,
    hamil,
    wf,
    params: Params,
    phys_conf: PhysicalConfiguration,
) -> tuple[Energy, Stats]:
    """Local energies over the [molecule, state, walker] batch grid."""
    eloc_of = hamil.local_energy(wf)
    over_walkers = jax.vmap(eloc_of, (0, None, 0))
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

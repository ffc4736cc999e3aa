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
    """Triple-vmap (molecule x state x walker) of the local energy."""
    rng = jax.random.split(rng, phys_conf.batch_shape)
    local_energy, hamil_stats = jax.vmap(  # molecule batch
        jax.vmap(  # electronic states
            jax.vmap(hamil.local_energy(wf), (0, None, 0))  # electron batch
        ),
        (0, None, 0),
    )(rng, params, phys_conf)
    stats = jax.tree_util.tree_map(lambda x: x.mean(axis=-1), hamil_stats)
    return local_energy, stats


def compute_mean_energy(local_energy: Energy, weight: Weight) -> tuple[Energy, Stats]:
    return all_device_mean(local_energy * weight), {}


def compute_mean_energy_tangent(
    local_energy: Energy,
    weight: Weight,
    log_psi_tangent: jax.Array,
    gradient_mask: jax.Array,
) -> jax.Array:
    """Control-variate VMC gradient: E[(E_loc - E_mean) * dlogpsi * w]."""
    per_state_mean = all_device_mean(local_energy * weight, axis=-1, keepdims=True)
    tangent = (local_energy - per_state_mean) * log_psi_tangent * weight
    return masked_mean(tangent, gradient_mask)

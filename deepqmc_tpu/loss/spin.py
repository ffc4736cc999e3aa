"""Spin (S^2) penalty terms (reference: /root/reference/src/deepqmc/loss/spin.py)."""

import jax
import jax.numpy as jnp

from ..parallel import all_device_mean
from ..physics import evaluate_spin
from ..types import Ansatz, Params, PhysicalConfiguration, Stats, Weight
from ..utils import masked_mean, weighted_std

__all__ = ()


def compute_spin_contributions(
    hamil, ansatz: Ansatz, params: Params, phys_conf: PhysicalConfiguration
) -> jax.Array:
    """Samplewise S^2 contributions over the [mol, state, walker] batch."""
    spin_of = evaluate_spin(hamil, ansatz.apply)
    over_walkers = jax.vmap(spin_of, (None, 0))
    over_states = jax.vmap(over_walkers)
    return jax.vmap(over_states, (None, 0))(params, phys_conf)


def compute_mean_spin(
    spin_contributions: jax.Array, weight: Weight
) -> tuple[jax.Array, Stats]:
    per_state = {
        'spin/mean': jnp.average(spin_contributions, axis=-1, weights=weight),
        'spin/std': weighted_std(spin_contributions, axis=-1, weights=weight),
    }
    return all_device_mean(spin_contributions * weight), per_state


def compute_mean_spin_tangent(
    spin_contributions: jax.Array,
    weight: Weight,
    log_psi_tangent: jax.Array,
    gradient_mask: jax.Array,
) -> jax.Array:
    """Covariance of the S^2 estimate with the score, clipped walkers masked."""
    baseline = all_device_mean(spin_contributions * weight, axis=-1, keepdims=True)
    score_times_dev = (spin_contributions - baseline) * log_psi_tangent * weight
    return masked_mean(score_times_dev, gradient_mask)

"""Spin (S^2) penalty terms (reference: /root/reference/src/deepqmc/loss/spin.py)."""

import jax
import jax.numpy as jnp

from ..parallel import all_device_mean
from ..physics import evaluate_spin
from ..types import Ansatz, Params, PhysicalConfiguration, Stats, Weight
from ..utils import masked_mean, weighted_std

__all__ = ()


def compute_spin_contributions(
    hamil,
    ansatz: Ansatz,
    params: Params,
    phys_conf: PhysicalConfiguration,
) -> jax.Array:
    """Samplewise S^2 contributions, triple-vmapped over the batch."""
    return jax.vmap(
        jax.vmap(jax.vmap(evaluate_spin(hamil, ansatz.apply), (None, 0))),
        (None, 0),
    )(params, phys_conf)


def compute_mean_spin(
    spin_contributions: jax.Array, weight: Weight
) -> tuple[jax.Array, Stats]:
    stats = {
        'spin/mean': jnp.average(spin_contributions, axis=-1, weights=weight),
        'spin/std': weighted_std(spin_contributions, axis=-1, weights=weight),
    }
    return all_device_mean(spin_contributions * weight), stats


def compute_mean_spin_tangent(
    spin_contributions: jax.Array,
    weight: Weight,
    log_psi_tangent: jax.Array,
    gradient_mask: jax.Array,
) -> jax.Array:
    per_state_mean = all_device_mean(
        spin_contributions * weight, axis=-1, keepdims=True
    )
    tangent = (spin_contributions - per_state_mean) * log_psi_tangent * weight
    return masked_mean(tangent, gradient_mask)

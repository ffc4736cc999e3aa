"""Overlap penalty terms for penalty-method excited states.

Reference: /root/reference/src/deepqmc/loss/overlap.py.  Implements the
pairwise wave-function ratio estimator R[i, j] = Psi_i(r ~ Psi_j^2) / Psi_j,
the clipped-geometric-mean symmetrized overlap, and the (one-sided) overlap
gradient with energy-gap/std scaling.
"""

from typing import Protocol

import jax
import jax.numpy as jnp

from ..parallel import all_device_mean
from ..types import Ansatz, DataDict, Params, PhysicalConfiguration, Psi, Stats, Weight
from ..utils import masked_mean, permute_matrix, triu_flat

__all__ = ()


def compute_wave_function_values(
    ansatz: Ansatz, params: Params, phys_conf: PhysicalConfiguration
) -> tuple[Psi, Stats]:
    """Evaluate every state's WF on samples drawn from every state.

    Output shape ``[mol, state_wf, state_sample, walker]`` (4-level vmap,
    reference overlap.py:37-47).
    """
    psi = jax.vmap(  # molecule batch
        jax.vmap(  # wf states
            jax.vmap(  # sample states
                jax.vmap(ansatz.apply, (None, 0)),  # electron batch
                (None, 0),
            ),
            (0, None),
        ),
        (None, 0),
    )(params, phys_conf)
    return psi, {}


def compute_single_sample_psi_ratios(psi: Psi, mean_log_psi: jax.Array) -> jax.Array:
    """R[i, j] = Psi_i / Psi_j at one sample, stabilized by mean-log shifts."""
    shifted = psi.log - mean_log_psi[:, None]
    log_ratio = shifted - jnp.diagonal(shifted)[None, :]
    sign_ratio = psi.sign * jnp.diagonal(psi.sign)[None, :]
    return sign_ratio * jnp.exp(log_ratio)


def compute_psi_ratio(
    ansatz: Ansatz, params: Params, phys_conf: PhysicalConfiguration
) -> tuple[jax.Array, Stats]:
    psi, stats = compute_wave_function_values(ansatz, params, phys_conf)
    mean_log_psi = jnp.mean(psi.log, axis=(-1, -2))
    psi_ratio = jax.vmap(  # molecule batch
        jax.vmap(compute_single_sample_psi_ratios, (-1, None), -1)  # electron batch
    )(psi, mean_log_psi)
    return psi_ratio, stats


def symmetrize_overlap_with_clipped_geometric_mean(x: jax.Array) -> jax.Array:
    """sign(x) * sqrt(clip(x * x^T, 0, inf)): zero where the two estimates disagree."""
    return jnp.sign(x) * jnp.sqrt(jnp.clip(x * jnp.transpose(x), 0.0))


def compute_mean_overlap(
    psi_ratio: jax.Array, weight: Weight
) -> tuple[jax.Array, Stats]:
    non_symm = all_device_mean(weight[:, None, :, :] * psi_ratio, axis=-1)
    symm = jax.vmap(symmetrize_overlap_with_clipped_geometric_mean)(non_symm)
    overlap_loss = jax.vmap(triu_flat)(symm**2).sum(axis=-1).mean()
    return overlap_loss, {'overlap/pairwise/mean': symm}


class OverlapGradientScaleFactory(Protocol):
    def __call__(self, data: DataDict) -> jax.Array: ...


def no_scaling(data: dict) -> jax.Array:
    return jnp.array(1.0)


def scale_by_energy_gap(data: dict, min_gap_scale_factor: float = 0.1) -> jax.Array:
    energy_ewm = data['energy_ewm']
    return jnp.clip(
        jnp.nan_to_num(jnp.abs(energy_ewm[:, :, None] - energy_ewm[:, None]), nan=1.0),
        min_gap_scale_factor,
        5.0,
    )


def scale_by_energy_std(data: dict, min_gap_scale_factor: float = 0.01) -> jax.Array:
    return jnp.clip(
        jnp.nan_to_num(data['std_ewm'].mean(axis=0), nan=5.0),
        min_gap_scale_factor,
        5.0,
    )[:, None]


def scale_by_max_gap_std(data: dict, min_gap_scale_factor: float = 0.1) -> jax.Array:
    return jnp.maximum(
        scale_by_energy_gap(data, min_gap_scale_factor),
        scale_by_energy_std(data, min_gap_scale_factor),
    )


def compute_mean_overlap_tangent(
    psi_ratio: jax.Array,
    weight: Weight,
    log_psi_tangent: jax.Array,
    ratio_gradient_mask: jax.Array,
    overlap: jax.Array,
    scale_factory: OverlapGradientScaleFactory,
    data: DataDict,
) -> jax.Array:
    """One-sided tangent of sum_ij S_ij^2 (no i<->j permuted term; states are
    ordered via ``data['ordering']`` instead, reference overlap.py:184-225)."""
    weight = weight[:, None, :, :]
    log_psi_tangent = log_psi_tangent[:, None, :, :]
    mean_psi_ratio = all_device_mean(weight * psi_ratio, axis=-1)
    tangent = (psi_ratio - mean_psi_ratio[..., None]) * weight * log_psi_tangent
    tangent = masked_mean(tangent, ratio_gradient_mask, axis=-1)
    tangent = 2 * tangent * mean_psi_ratio.swapaxes(-1, -2)
    tangent = tangent * scale_factory(data)
    tangent = jax.vmap(permute_matrix)(tangent, data['ordering'])
    return jax.vmap(triu_flat)(tangent).sum(axis=-1).mean()

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

    Output shape ``[mol, state_wf, state_sample, walker]`` (cross-state
    evaluation grid, reference overlap.py:37-47), built from named vmap
    stages so each batching level reads off the code.
    """
    over_walkers = jax.vmap(ansatz.apply, (None, 0))
    over_sample_states = jax.vmap(over_walkers, (None, 0))
    over_wf_states = jax.vmap(over_sample_states, (0, None))
    over_molecules = jax.vmap(over_wf_states, (None, 0))
    return over_molecules(params, phys_conf), {}


def _diag_states(x: jax.Array) -> jax.Array:
    """x[mol, j, j, walker] from x[mol, i, j, walker]."""
    return jnp.diagonal(x, axis1=1, axis2=2).swapaxes(-1, -2)


def compute_psi_ratio(
    ansatz: Ansatz, params: Params, phys_conf: PhysicalConfiguration
) -> tuple[jax.Array, Stats]:
    """R[mol, i, j, walker] = Psi_i / Psi_j on walkers drawn from Psi_j^2.

    The log ratio is stabilized by shifting each wf state's log values by its
    own grid mean before exponentiating (one whole-array broadcast; no
    per-sample helper).
    """
    psi, stats = compute_wave_function_values(ansatz, params, phys_conf)
    shifted = psi.log - psi.log.mean(axis=(-1, -2))[:, :, None, None]
    log_ratio = shifted - _diag_states(shifted)[:, None]
    sign_ratio = psi.sign * _diag_states(psi.sign)[:, None]
    return sign_ratio * jnp.exp(log_ratio), stats


def symmetrize_overlap_with_clipped_geometric_mean(x: jax.Array) -> jax.Array:
    """sign(x) * sqrt(clip(x * x^T, 0, inf)): zero where the two estimates disagree."""
    return jnp.sign(x) * jnp.sqrt(jnp.clip(x * jnp.transpose(x), 0.0))


def _upper_pairs_sum(per_mol_matrix: jax.Array) -> jax.Array:
    """Sum over distinct state pairs (i < j), then mean over molecules."""
    return jax.vmap(triu_flat)(per_mol_matrix).sum(axis=-1).mean()


def compute_mean_overlap(
    psi_ratio: jax.Array, weight: Weight
) -> tuple[jax.Array, Stats]:
    one_sided = all_device_mean(weight[:, None, :, :] * psi_ratio, axis=-1)
    symm = jax.vmap(symmetrize_overlap_with_clipped_geometric_mean)(one_sided)
    return _upper_pairs_sum(symm**2), {'overlap/pairwise/mean': symm}


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
    w = weight[:, None, :, :]
    dlog = log_psi_tangent[:, None, :, :]
    S_one_sided = all_device_mean(w * psi_ratio, axis=-1)
    # d/dtheta of the one-sided estimate: covariance of the ratio with the
    # score, clipped walkers masked out of the mean
    dS = masked_mean(
        (psi_ratio - S_one_sided[..., None]) * w * dlog,
        ratio_gradient_mask,
        axis=-1,
    )
    # chain rule for S_ij^2 through the symmetrized product, per-pair scaling,
    # and the EWM-energy state ordering
    per_pair = 2 * dS * S_one_sided.swapaxes(-1, -2) * scale_factory(data)
    ordered = jax.vmap(permute_matrix)(per_pair, data['ordering'])
    return _upper_pairs_sum(ordered)

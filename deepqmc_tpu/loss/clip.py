"""Outlier clipping of local energies and wave-function ratios.

Reference: /root/reference/src/deepqmc/loss/clip.py.  The cross-device
median/quantile statistics are plain reductions over the globally-sharded
walker axis here (XLA gathers over ICI as needed).
"""

from typing import Protocol, Union

import jax
import jax.numpy as jnp

from ..parallel import (
    all_device_mean,
    all_device_median,
    all_device_quantile,
)
from ..types import Energy
from ..utils import log_squeeze

__all__ = ()


class LocalEnergyClipAndMaskFn(Protocol):
    def __call__(self, local_energy: Energy) -> tuple[Energy, jax.Array]: ...


class PsiRatioClipAndMaskFn(Protocol):
    def __call__(self, psi_ratio: jax.Array) -> tuple[jax.Array, jax.Array]: ...


def clip_local_energy(clip_mask_fn, local_energy: Energy):
    """Apply the clip function per (molecule, state) electron batch."""
    return jax.vmap(jax.vmap(clip_mask_fn))(local_energy)


def clip_psi_ratio(clip_mask_fn, psi_ratio: jax.Array):
    """Apply the ratio clip function per (molecule, state, state) batch."""
    return jax.vmap(jax.vmap(jax.vmap(clip_mask_fn)))(psi_ratio)


def median_clip_and_mask(
    x: jax.Array,
    clip_width: float,
    median_center: bool,
    exclude_width: float = jnp.inf,
) -> tuple[jax.Array, jax.Array]:
    """FermiNet/PsiFormer-style hard clip at ``clip_width`` mean-absolute
    deviations around the median (or mean)."""
    center = all_device_median(x) if median_center else all_device_mean(x)
    abs_diff = jnp.abs(x - center)
    mad = all_device_mean(abs_diff)
    x_clip = jnp.clip(x, center - clip_width * mad, center + clip_width * mad)
    gradient_mask = abs_diff < exclude_width
    return x_clip, gradient_mask


def median_log_squeeze_and_mask(
    x: jax.Array,
    clip_width: float = 1.0,
    quantile: Union[float, jax.Array] = 0.95,
    exclude_width: float = jnp.inf,
) -> tuple[jax.Array, jax.Array]:
    """Default soft clip: log-squeeze deviations beyond a quantile width."""
    x_median = all_device_median(x)
    x_diff = x - x_median
    x_abs_diff = jnp.abs(x_diff)
    q = all_device_quantile(x_abs_diff, quantile)
    width = clip_width * q
    x_clip = x_median + 2 * width * log_squeeze(x_diff / (2 * width))
    gradient_mask = x_abs_diff / q < exclude_width
    return x_clip, gradient_mask


def psi_ratio_clip_and_mask(
    psi_ratio: jax.Array,
    *,
    clip_width: float = 10.0,
    exclude_width: float = jnp.inf,
) -> tuple[jax.Array, jax.Array]:
    """Hard clip of WF ratios at ``clip_width`` median-absolute deviations."""
    center = all_device_median(psi_ratio)
    deviation = jnp.abs(psi_ratio - center)
    sigma = all_device_median(deviation)
    clipped = jnp.clip(
        psi_ratio, center - clip_width * sigma, center + clip_width * sigma
    )
    mask = deviation < exclude_width
    return clipped, mask

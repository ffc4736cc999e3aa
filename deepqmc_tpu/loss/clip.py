"""Robust-statistics guards for the VMC gradient estimator.

Local energies develop fat tails near wave-function nodes, so the gradient
estimator recentres every electron batch on a robust location statistic and
compresses (or cuts) the residuals at a data-derived scale before they enter
the loss difference.  All statistics are computed over the GLOBAL walker
population: the reductions run on the sharded walker axis and XLA inserts
the ICI collectives (parallel.all_device_*), where the reference reduces
per-device batches under pmap (reference loss/clip.py).

Every clip function returns ``(transformed_x, gradient_mask)``; the mask
drops walkers whose residual exceeds ``exclude_width`` scales from the
gradient entirely (off by default: infinite width keeps everything).
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


def _recentre(x, robust: bool):
    """Residuals around a global location statistic.

    ``robust=True`` centres on the median, else on the mean; returns the
    centre, the residuals, and their absolute values (the input to every
    scale statistic below).
    """
    loc = (all_device_median if robust else all_device_mean)(x)
    resid = x - loc
    return loc, resid, jnp.abs(resid)


def _hard_window(loc, resid, absr, window, exclude_width):
    """Clamp residuals into ``loc +/- window``; mask outliers past
    ``exclude_width`` (in the same units as ``absr``)."""
    clamped = jnp.minimum(jnp.maximum(resid, -window), window)
    keep = absr < exclude_width
    return loc + clamped, keep


def median_clip_and_mask(
    x: jax.Array,
    clip_width: float,
    median_center: bool,
    exclude_width: float = jnp.inf,
) -> tuple[jax.Array, jax.Array]:
    """Hard clip at ``clip_width`` mean-absolute-deviations.

    The FermiNet/PsiFormer recipe: scale = MAD (mean of |residual|), and the
    residual is clamped to the (+/-) ``clip_width * MAD`` window around the
    centre.  ``median_center`` picks median vs mean recentring.
    """
    loc, resid, absr = _recentre(x, robust=median_center)
    mad = all_device_mean(absr)
    return _hard_window(loc, resid, absr, clip_width * mad, exclude_width)


def median_log_squeeze_and_mask(
    x: jax.Array,
    clip_width: float = 1.0,
    quantile: Union[float, jax.Array] = 0.95,
    exclude_width: float = jnp.inf,
) -> tuple[jax.Array, jax.Array]:
    """Default soft clip: logarithmic squeeze beyond a quantile scale.

    The scale is the ``quantile``-th quantile of |residual| (a 95% envelope
    by default); residuals are passed through the identity near zero and
    compressed logarithmically past ``2 * clip_width`` scales, so no walker
    is ever discarded outright, only de-weighted.
    """
    _, resid, absr = _recentre(x, robust=True)
    scale = all_device_quantile(absr, quantile)
    halfwidth = 2 * clip_width * scale
    squeezed = halfwidth * log_squeeze(resid / halfwidth)
    keep = absr / scale < exclude_width
    return x + (squeezed - resid), keep


def psi_ratio_clip_and_mask(
    psi_ratio: jax.Array,
    *,
    clip_width: float = 10.0,
    exclude_width: float = jnp.inf,
) -> tuple[jax.Array, jax.Array]:
    """Hard clip of excited-state WF ratios at ``clip_width``
    median-absolute-deviations (the all-median variant: ratios are far
    heavier-tailed than local energies, so even the scale uses the median).
    """
    loc, resid, absr = _recentre(psi_ratio, robust=True)
    mad = all_device_median(absr)
    return _hard_window(loc, resid, absr, clip_width * mad, exclude_width)

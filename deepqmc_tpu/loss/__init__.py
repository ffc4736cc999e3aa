"""VMC loss functions with custom gradient estimators."""

from .clip import (  # noqa: F401
    LocalEnergyClipAndMaskFn,
    PsiRatioClipAndMaskFn,
    median_clip_and_mask,
    median_log_squeeze_and_mask,
    psi_ratio_clip_and_mask,
)
from .loss_function import LossFunctionFactory, create_loss_fn  # noqa: F401

__all__ = [
    'LocalEnergyClipAndMaskFn',
    'LossFunctionFactory',
    'PsiRatioClipAndMaskFn',
    'median_clip_and_mask',
    'median_log_squeeze_and_mask',
    'psi_ratio_clip_and_mask',
    'create_loss_fn',
]

"""Kronecker-factored approximate curvature (natural gradient) for VMC."""

from .kfac import KFAC  # noqa: F401

__all__ = ['KFAC']

"""Custom primitives and TPU (Pallas) kernels for the hot operations."""

from .slogdet import slogdet, slogdet_flat, unflatten_dets  # noqa: F401

__all__ = ['slogdet', 'slogdet_flat', 'unflatten_dets']

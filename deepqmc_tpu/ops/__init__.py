"""Custom primitives and TPU (Pallas) kernels for the hot operations."""

from .slogdet import slogdet  # noqa: F401

__all__ = ['slogdet']

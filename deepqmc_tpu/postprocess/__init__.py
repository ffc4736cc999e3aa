"""Post-processing of training/evaluation results."""

from .workdir import read_and_convert_result, read_workdir  # noqa: F401

__all__ = ['read_workdir', 'read_and_convert_result']

"""Pallas TPU kernels for the hot ops (XLA fallbacks included)."""

from .segment_moments import segment_moments  # noqa: F401

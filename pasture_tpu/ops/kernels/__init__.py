"""Pallas TPU kernels for the hot per-point stages."""

from .fused_transform import fused_decode_transform_key  # noqa: F401

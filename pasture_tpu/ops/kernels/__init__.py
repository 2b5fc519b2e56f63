"""Pallas TPU kernels for the hot per-point stages."""

from .fused_transform import (  # noqa: F401
    fused_decode_transform_key, fused_voxel_head, fused_world_bounds)

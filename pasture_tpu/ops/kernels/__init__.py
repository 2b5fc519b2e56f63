"""Pallas TPU kernels for the hot per-point stages."""

from .fused_transform import (  # noqa: F401
    exact_local_max_leaf, fused_decode_transform_key, fused_voxel_head,
    fused_voxel_head_exact_local, fused_world_bounds)

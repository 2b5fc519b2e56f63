"""Device compute ops (XLA/Pallas) over :class:`~pasture_tpu.buffers.PointBatch`.

The TPU-native replacement for pasture's per-point hot loops: every op here
is jit-compatible, static-shaped (padding + ``count`` masking) and vectorised
over whole columns.  The user-facing algorithm API with pasture parity lives
in :mod:`pasture_tpu.algorithms`; these are the building blocks.
"""

from .reductions import (  # noqa: F401
    masked_min, masked_max, masked_minmax, batch_bounds,
    segment_mean, segment_mode, segment_max, segment_min, segment_sum,
)
from .transform import (  # noqa: F401
    affine_transform, decode_las_positions, encode_las_positions,
    transform_positions,
)
from .convert import convert_batch_schema, rust_as_cast_device  # noqa: F401
from .filter import compact_batch, filter_batch  # noqa: F401
from .sort import morton_sort, sort_by_keys  # noqa: F401
from .voxel import voxel_downsample, voxel_indices  # noqa: F401
from .voxel_merge import merge_voxel_batches  # noqa: F401

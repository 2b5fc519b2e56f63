"""Math utilities (pasture-core ``math`` parity + SE3 for registration)."""

from ..layout.schema import align_to
from .aabb import AABB
from .minmax import infimum, minmax_column, supremum
from .morton import (expand_bits_by_3, morton_encode_dual32, morton_encode_u64,
                     reverse_bits)

__all__ = [
    "AABB", "align_to", "infimum", "supremum", "minmax_column",
    "expand_bits_by_3", "reverse_bits", "morton_encode_u64",
    "morton_encode_dual32",
]

"""Attribute datatype system.

TPU-native re-design of pasture's ``PointAttributeDataType`` closed enum
(reference: pasture-core/src/layout/point_layout.rs:23-127).  Each datatype is
a small frozen descriptor that knows

* its wire size + minimal alignment (drives packed record layouts at the I/O
  boundary, exactly like the reference),
* its **host** numpy dtype/shape (exact semantics, f64 capable), and
* its **device** jax dtype/shape under a configurable :class:`DevicePolicy`
  (TPUs have no fast f64; the policy decides how wide types land on device).

Unlike the reference there is no interleaved in-memory representation on
device — device data is always SoA columns (one array per attribute); the
wire layout only matters for host-side (de)serialisation.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

__all__ = [
    "PointDtype",
    "DevicePolicy",
    "U8", "U16", "U32", "U64",
    "I8", "I16", "I32", "I64",
    "F32", "F64",
    "VEC3U8", "VEC3U16", "VEC3I32", "VEC3F32", "VEC3F64", "VEC4U8",
    "byte_array", "custom",
    "SCALAR_DTYPES", "ALL_NAMED_DTYPES", "dtype_from_name",
]


@dataclasses.dataclass(frozen=True)
class PointDtype:
    """Descriptor of one attribute datatype.

    ``kind`` is one of ``"uint"``, ``"int"``, ``"float"``, ``"bytes"``,
    ``"custom"``.  ``shape`` is the per-point component shape: ``()`` for
    scalars, ``(3,)``/``(4,)`` for vectors, ``(n,)`` of u8 for byte arrays.
    """

    name: str
    kind: str
    bits: int                      # bits per component (8 for bytes/custom)
    shape: Tuple[int, ...]         # per-point component shape
    # for "custom": explicit size/alignment override (pasture Custom{size,align})
    _size: Optional[int] = None
    _align: Optional[int] = None

    # ---- sizes / alignment (mirrors PointAttributeDataType::size/min_alignment)
    @property
    def component_size(self) -> int:
        return self.bits // 8

    @property
    def num_components(self) -> int:
        n = 1
        for d in self.shape:
            n *= d
        return n

    @property
    def size(self) -> int:
        """Wire size in bytes of one attribute value."""
        if self._size is not None:
            return self._size
        return self.component_size * self.num_components

    @property
    def min_alignment(self) -> int:
        """Natural alignment (component alignment, like repr(C) vectors)."""
        if self._align is not None:
            return self._align
        return self.component_size

    # ---- host (numpy) mapping -------------------------------------------------
    @property
    def np_component_dtype(self) -> np.dtype:
        if self.kind == "uint":
            return np.dtype(f"<u{self.component_size}")
        if self.kind == "int":
            return np.dtype(f"<i{self.component_size}")
        if self.kind == "float":
            return np.dtype(f"<f{self.component_size}")
        # bytes / custom: raw u8 payload
        return np.dtype("u1")

    @property
    def np_shape(self) -> Tuple[int, ...]:
        """Shape of the numpy payload for one point."""
        if self.kind in ("bytes", "custom"):
            return (self.size,)
        return self.shape

    def np_field(self) -> tuple:
        """(dtype, shape) pair usable inside a numpy structured dtype."""
        if self.np_shape == ():
            return (self.np_component_dtype, ())
        return (self.np_component_dtype, self.np_shape)

    # ---- predicates -----------------------------------------------------------
    @property
    def is_scalar(self) -> bool:
        return self.shape == () and self.kind in ("uint", "int", "float")

    @property
    def is_vector(self) -> bool:
        return self.shape != () and self.kind in ("uint", "int", "float")

    def __str__(self) -> str:  # matches pasture Display loosely
        return self.name

    def __repr__(self) -> str:
        return f"PointDtype({self.name})"


# ---- the closed set of named dtypes (pasture point_layout.rs:23-127) ----------
U8 = PointDtype("U8", "uint", 8, ())
U16 = PointDtype("U16", "uint", 16, ())
U32 = PointDtype("U32", "uint", 32, ())
U64 = PointDtype("U64", "uint", 64, ())
I8 = PointDtype("I8", "int", 8, ())
I16 = PointDtype("I16", "int", 16, ())
I32 = PointDtype("I32", "int", 32, ())
I64 = PointDtype("I64", "int", 64, ())
F32 = PointDtype("F32", "float", 32, ())
F64 = PointDtype("F64", "float", 64, ())
VEC3U8 = PointDtype("Vec3u8", "uint", 8, (3,))
VEC3U16 = PointDtype("Vec3u16", "uint", 16, (3,))
VEC3I32 = PointDtype("Vec3i32", "int", 32, (3,))
VEC3F32 = PointDtype("Vec3f32", "float", 32, (3,))
VEC3F64 = PointDtype("Vec3f64", "float", 64, (3,))
VEC4U8 = PointDtype("Vec4u8", "uint", 8, (4,))

SCALAR_DTYPES = (U8, U16, U32, U64, I8, I16, I32, I64, F32, F64)
ALL_NAMED_DTYPES = SCALAR_DTYPES + (VEC3U8, VEC3U16, VEC3I32, VEC3F32, VEC3F64, VEC4U8)

_BY_NAME = {d.name: d for d in ALL_NAMED_DTYPES}


def dtype_from_name(name: str) -> PointDtype:
    """Look up a :class:`PointDtype` by its pasture name (``"U8"``,
    ``"Vec3f64"``, ...; reference PointAttributeDataType FromStr,
    layout/point_attribute.rs)."""
    try:
        return _BY_NAME[name]
    except KeyError:
        raise KeyError(f"unknown point dtype {name!r}") from None


def byte_array(n: int) -> PointDtype:
    """``ByteArray(n)`` — untyped blob of ``n`` bytes (point_layout.rs:44)."""
    return PointDtype(f"ByteArray({n})", "bytes", 8, (n,))


def custom(size: int, align: int = 1, tag: str = "") -> PointDtype:
    """``Custom{size, align}`` opaque datatype (point_layout.rs:47-52)."""
    return PointDtype(f"Custom({size},{align},{tag})", "custom", 8, (size,),
                      _size=size, _align=align)


# ---- device policy ------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class DevicePolicy:
    """How host dtypes land on device.

    TPUs have no native f64 and (without jax x64) no 64-bit ints.  The default
    policy narrows 64-bit types; exact paths keep positions as LAS-native i32
    local coordinates plus a host-side f64 scale/offset instead of relying on
    device f64 (see pasture_tpu.buffers.device.PointBatch).
    """

    f64: str = "float32"
    u64: str = "uint32"
    i64: str = "int32"

    def jax_dtype(self, d: PointDtype):
        import jax.numpy as jnp

        if d.kind == "float":
            return jnp.dtype(self.f64) if d.bits == 64 else jnp.float32 if d.bits == 32 else jnp.float32
        if d.kind == "uint":
            if d.bits == 64:
                return jnp.dtype(self.u64)
            return jnp.dtype(f"uint{d.bits}")
        if d.kind == "int":
            if d.bits == 64:
                return jnp.dtype(self.i64)
            return jnp.dtype(f"int{d.bits}")
        return jnp.uint8


#: Narrowing policy safe on any TPU without x64 mode.
DevicePolicy.NARROW = DevicePolicy()
#: Exact policy — requires jax_enable_x64 (CPU tests, or when exactness wins).
DevicePolicy.EXACT = DevicePolicy(f64="float64", u64="uint64", i64="int64")

"""Schema conversion on device.

The device counterpart of pasture's ``BufferLayoutConverter``
(reference: pasture-core/src/layout/conversion/buffer_conversion.rs:98-450):
where the host-side :class:`~pasture_tpu.layout.conversion.SchemaConverter`
maps numpy columns, this op converts whole :class:`PointBatch` columns with
the same Rust-``as`` cast semantics, fully inside jit (XLA fuses casts into
neighbouring ops).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp

from ..buffers.device import PointBatch
from ..layout.dtypes import DevicePolicy, PointDtype
from ..layout.schema import PointSchema

__all__ = ["rust_as_cast_device", "convert_batch_schema"]


def rust_as_cast_device(x: jnp.ndarray, dst) -> jnp.ndarray:
    """Rust ``as`` cast on device: int->int wraps, float->int truncates
    toward zero + saturates (NaN -> 0), int->float rounds — matching
    attribute_conversion.rs:188-264 like the host
    :func:`~pasture_tpu.layout.conversion.rust_as_cast`."""
    dst = jnp.dtype(dst)
    if x.dtype == dst:
        return x
    src_float = jnp.issubdtype(x.dtype, jnp.floating)
    dst_float = jnp.issubdtype(dst, jnp.floating)
    if src_float and not dst_float:
        info = jnp.iinfo(dst)
        t = jnp.trunc(x)
        t = jnp.where(jnp.isnan(t), 0.0, t)
        return jnp.clip(t, float(info.min), float(info.max)).astype(dst)
    if not src_float and not dst_float:
        # int->int truncates/wraps like C: go through the unsigned bit width
        return x.astype(dst)  # XLA convert wraps for narrowing int casts
    return x.astype(dst)


def convert_batch_schema(batch: PointBatch, to_schema: PointSchema,
                         policy: DevicePolicy = DevicePolicy.NARROW,
                         fill_missing_with_default: bool = False,
                         rename: Optional[Dict[str, str]] = None
                         ) -> PointBatch:
    """Convert a batch to another schema on device.

    Name-matched columns cast with ``as`` semantics to the target dtype
    under ``policy``; with ``fill_missing_with_default`` absent targets are
    zero-filled (``for_layouts_with_default`` parity); ``rename`` maps
    target attribute name -> source column name (custom mappings).
    """
    rename = rename or {}
    data = {}
    for member in to_schema.members:
        src_name = rename.get(member.name, member.name)
        if src_name in batch.data:
            col = batch.data[src_name]
            data[member.name] = rust_as_cast_device(
                col, policy.jax_dtype(member.dtype))
        elif fill_missing_with_default:
            shape = (batch.capacity,) + member.dtype.np_shape
            data[member.name] = jnp.zeros(
                shape, policy.jax_dtype(member.dtype))
        else:
            raise ValueError(
                f"target attribute {member.name!r} has no source column "
                f"(use fill_missing_with_default to zero-fill)")
    return PointBatch(data, batch.count, to_schema, batch.meta)

"""Device-resident point batches (SoA pytrees).

The TPU-native replacement for pasture's buffer hierarchy: a
:class:`PointBatch` is a pytree of one jax array per attribute (always
columnar — reference pasture-core/src/containers/point_buffer.rs's
``HashMapBuffer`` is the closest analog) plus a validity ``count``.  Arrays
are padded to a static capacity so that every op compiles with static shapes;
reductions mask out the tail (SURVEY.md §7 hard part (b)).

Design notes for TPU:

* dtypes are narrowed by a :class:`~pasture_tpu.layout.dtypes.DevicePolicy`
  (no native f64/i64 on TPU).  Exactness-critical position math instead uses
  LAS-native ``i32`` local coordinates + per-batch scale/offset carried in
  ``meta`` (see pasture_tpu.io.las) — the same trick the LAS format itself
  uses, so no precision is lost relative to the reference.
* a batch is a normal pytree: it can be donated, sharded with
  ``jax.sharding.NamedSharding`` over a points axis, and passed through jit.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..layout.attributes import PointAttribute
from ..layout.dtypes import DevicePolicy
from ..layout.schema import PointSchema
from .host import HostPointBuffer

__all__ = ["PointBatch"]


def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PointBatch:
    """N points as SoA device arrays, padded to ``capacity``.

    ``data[name]`` has shape ``(capacity,)`` or ``(capacity, C)``;
    ``count`` is an int32 scalar with the number of valid points;
    ``meta`` holds small per-batch arrays (e.g. position scale/offset).
    ``schema`` describes the *logical* (host) dtypes and is static.
    """

    data: Dict[str, jnp.ndarray]
    count: jnp.ndarray
    schema: PointSchema
    meta: Dict[str, jnp.ndarray] = dataclasses.field(default_factory=dict)

    # ---- pytree protocol ------------------------------------------------------
    def tree_flatten(self):
        data_keys = tuple(sorted(self.data))
        meta_keys = tuple(sorted(self.meta))
        leaves = tuple(self.data[k] for k in data_keys) + (self.count,) + tuple(
            self.meta[k] for k in meta_keys)
        return leaves, (data_keys, meta_keys, self.schema)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        data_keys, meta_keys, schema = aux
        nd = len(data_keys)
        data = dict(zip(data_keys, leaves[:nd]))
        count = leaves[nd]
        meta = dict(zip(meta_keys, leaves[nd + 1:]))
        return cls(data, count, schema, meta)

    # ---- constructors ---------------------------------------------------------
    @classmethod
    def from_host(
        cls,
        buffer: HostPointBuffer,
        policy: DevicePolicy = DevicePolicy.NARROW,
        capacity: Optional[int] = None,
        pad_multiple: int = 8,
    ) -> "PointBatch":
        n = len(buffer)
        cap = capacity if capacity is not None else max(_round_up(max(n, 1), pad_multiple), pad_multiple)
        if cap < n:
            raise ValueError(f"capacity {cap} < point count {n}")
        data = {}
        for m in buffer.schema.members:
            col = buffer.columns[m.name]
            jdt = policy.jax_dtype(m.dtype)
            if m.dtype.kind in ("bytes", "custom"):
                host = col.astype(np.uint8)
            else:
                host = col.astype(jdt)
            if cap != n:
                pad_width = [(0, cap - n)] + [(0, 0)] * (host.ndim - 1)
                host = np.pad(host, pad_width)
            data[m.name] = jnp.asarray(host)
        return cls(data, jnp.asarray(n, jnp.int32), buffer.schema)

    @classmethod
    def from_columns(
        cls, schema: PointSchema, columns: Dict[str, jnp.ndarray],
        count: Optional[Union[int, jnp.ndarray]] = None,
        meta: Optional[Dict[str, jnp.ndarray]] = None,
    ) -> "PointBatch":
        cap = None
        for v in columns.values():
            cap = v.shape[0]
            break
        if count is None:
            count = cap if cap is not None else 0
        return cls(dict(columns), jnp.asarray(count, jnp.int32), schema, meta or {})

    # ---- queries --------------------------------------------------------------
    @property
    def capacity(self) -> int:
        for v in self.data.values():
            return v.shape[0]
        return 0

    def __len__(self) -> int:
        return self.capacity

    def get(self, attribute: Union[str, PointAttribute]) -> jnp.ndarray:
        name = attribute if isinstance(attribute, str) else attribute.name
        return self.data[name]

    def valid_mask(self) -> jnp.ndarray:
        """Boolean (capacity,) mask of valid points."""
        return jnp.arange(self.capacity, dtype=jnp.int32) < self.count

    # ---- functional updates ---------------------------------------------------
    def with_column(self, name: str, values: jnp.ndarray) -> "PointBatch":
        data = dict(self.data)
        data[name] = values
        return PointBatch(data, self.count, self.schema, self.meta)

    def with_meta(self, name: str, value: jnp.ndarray) -> "PointBatch":
        meta = dict(self.meta)
        meta[name] = value
        return PointBatch(self.data, self.count, self.schema, meta)

    def with_count(self, count) -> "PointBatch":
        return PointBatch(self.data, jnp.asarray(count, jnp.int32), self.schema, self.meta)

    def gather(self, indices: jnp.ndarray, count=None) -> "PointBatch":
        """Row gather: reorder/select points by index (static output size)."""
        data = {k: jnp.take(v, indices, axis=0) for k, v in self.data.items()}
        new_count = self.count if count is None else jnp.asarray(count, jnp.int32)
        return PointBatch(data, new_count, self.schema, self.meta)

    def pad_to(self, capacity: int) -> "PointBatch":
        if capacity < self.capacity:
            raise ValueError("pad_to cannot shrink; use slice")
        extra = capacity - self.capacity
        data = {
            k: jnp.pad(v, [(0, extra)] + [(0, 0)] * (v.ndim - 1))
            for k, v in self.data.items()
        }
        return PointBatch(data, self.count, self.schema, self.meta)

    @classmethod
    def concatenate(cls, batches: Sequence["PointBatch"],
                    compact: bool = True) -> "PointBatch":
        """Concat along the point axis (static output capacity).

        By default the result is *compacted*: valid rows of every input are
        moved to the front (stable, original order preserved) so the result
        satisfies the ``rows [0, count)`` invariant even when inputs carry
        padding.  Pass ``compact=False`` to skip the gather when every input
        is known full (count == capacity) — cheaper, but the caller asserts
        that invariant.
        """
        first = batches[0]
        data = {
            k: jnp.concatenate([b.data[k] for b in batches], axis=0)
            for k in first.data
        }
        count = sum((b.count for b in batches), jnp.asarray(0, jnp.int32))
        out = cls(data, count, first.schema, first.meta)
        if compact:
            valid = jnp.concatenate([b.valid_mask() for b in batches])
            # stable sort: valid rows first, original order preserved
            order = jnp.argsort(~valid, stable=True)
            out = out.gather(order)
        return out

    # ---- host transfer --------------------------------------------------------
    def to_host(self, trim: bool = True) -> HostPointBuffer:
        """Copy back to host, casting to the schema's exact numpy dtypes."""
        n = int(jax.device_get(self.count))
        cols = {}
        for m in self.schema.members:
            arr = np.asarray(jax.device_get(self.data[m.name]))
            if trim:
                arr = arr[:n]
            cols[m.name] = np.ascontiguousarray(arr.astype(m.dtype.np_component_dtype))
        return HostPointBuffer(self.schema, cols, validate=False)

    def __repr__(self) -> str:
        return (f"PointBatch(capacity={self.capacity}, "
                f"attrs={sorted(self.data)}, meta={sorted(self.meta)})")

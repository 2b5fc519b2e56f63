"""Property-style buffer tests over random schemas and data.

Parity with the reference's strongest core tier: the same scenario battery
(wire round trip, slicing, append, conversion, device round trip) runs
against randomly generated schemas and point data
(point_buffer.rs:1793-2329 + test_utils.rs random distributions).
"""

import numpy as np
import pytest

from pasture_tpu.buffers.device import PointBatch
from pasture_tpu.buffers.host import HostPointBuffer
from pasture_tpu.layout import dtypes as dt
from pasture_tpu.layout.attributes import PointAttribute
from pasture_tpu.layout.dtypes import DevicePolicy
from pasture_tpu.layout.schema import PointSchema

_DTYPE_POOL = [dt.U8, dt.U16, dt.U32, dt.U64, dt.I8, dt.I16, dt.I32,
               dt.I64, dt.F32, dt.F64, dt.VEC3U8, dt.VEC3U16, dt.VEC3I32,
               dt.VEC3F32, dt.VEC3F64, dt.VEC4U8]


def _random_schema(rng, n_attrs, packed):
    attrs = []
    for i in range(n_attrs):
        d = _DTYPE_POOL[rng.integers(0, len(_DTYPE_POOL))]
        attrs.append(PointAttribute(f"attr_{i}", d))
    if packed:
        return PointSchema.from_attributes_packed(attrs)
    return PointSchema.from_attributes(attrs)


def _random_column(rng, m, n):
    d = m.dtype
    shape = (n,) + d.np_shape
    if d.kind == "float":
        return rng.normal(size=shape).astype(d.np_component_dtype)
    info = np.iinfo(d.np_component_dtype)
    return rng.integers(info.min, info.max, shape, endpoint=True,
                        dtype=d.np_component_dtype)


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("packed", [False, True])
def test_random_schema_scenarios(seed, packed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 60))
    schema = _random_schema(rng, int(rng.integers(1, 7)), packed)
    cols = {m.name: _random_column(rng, m, n) for m in schema.members}
    buf = HostPointBuffer.from_columns(schema, cols)

    # wire round trip (interleaved records <-> columns, both copy modes)
    wire = buf.to_interleaved()
    assert wire.itemsize == schema.point_size
    back = HostPointBuffer.from_interleaved(schema, wire.tobytes())
    back_view = HostPointBuffer.from_interleaved(schema, wire, copy=False)
    for name in schema.names:
        np.testing.assert_array_equal(back.get(name), cols[name], err_msg=name)
        np.testing.assert_array_equal(back_view.get(name), cols[name])

    # slicing + re-slicing + append
    a, b = sorted(rng.integers(0, n + 1, 2))
    sl = buf.slice(a, b)
    assert len(sl) == b - a
    if len(sl) > 1:
        sl2 = sl.slice(1, len(sl))
        np.testing.assert_array_equal(
            sl2.get(schema.names[0]), cols[schema.names[0]][a + 1:b])
    joined = buf.append(sl)
    assert len(joined) == n + (b - a)

    # filter
    mask = rng.random(n) < 0.5
    filt = buf.filter(mask)
    assert len(filt) == int(mask.sum())

    # per-point access equals column access
    i = int(rng.integers(0, n))
    p = buf.point(i)
    for name in schema.names:
        np.testing.assert_array_equal(p[name], cols[name][i])

    # device round trip under the exact policy preserves everything
    batch = PointBatch.from_host(buf, policy=DevicePolicy.EXACT)
    host2 = batch.to_host()
    for name in schema.names:
        np.testing.assert_array_equal(host2.get(name), cols[name],
                                      err_msg=name)


@pytest.mark.parametrize("seed", range(4))
def test_random_schema_conversion_roundtrip(seed):
    """Widening conversions round-trip exactly (the reference's dynamic
    attribute comparison, tests/common compare_attributes_dynamically)."""
    rng = np.random.default_rng(100 + seed)
    n = 32
    widen = {dt.U8: dt.U16, dt.U16: dt.U32, dt.I8: dt.I16, dt.I16: dt.I32,
             dt.F32: dt.F64, dt.VEC3U8: dt.VEC3U16, dt.VEC3F32: dt.VEC3F64}
    narrow_pool = list(widen.keys())
    attrs = [PointAttribute(f"a{i}",
                            narrow_pool[rng.integers(0, len(narrow_pool))])
             for i in range(4)]
    schema = PointSchema.from_attributes(attrs)
    cols = {m.name: _random_column(rng, m, n) for m in schema.members}
    buf = HostPointBuffer.from_columns(schema, cols)

    wide_schema = PointSchema.from_attributes(
        [a.with_dtype(widen[a.dtype]) for a in attrs])
    wide = buf.convert_schema(wide_schema)
    back = wide.convert_schema(schema)
    for name in schema.names:
        np.testing.assert_array_equal(back.get(name), cols[name],
                                      err_msg=name)

"""Parity extras: per-point access, device schema conversion, batch table."""

import jax
import jax.numpy as jnp
import numpy as np

from pasture_tpu.buffers.device import PointBatch
from pasture_tpu.buffers.host import HostPointBuffer
from pasture_tpu.layout import attributes as att
from pasture_tpu.layout import dtypes as dt
from pasture_tpu.layout.dtypes import DevicePolicy
from pasture_tpu.layout.schema import PointSchema
from pasture_tpu.ops import convert_batch_schema, rust_as_cast_device


def _buf(rng, n=10):
    schema = PointSchema.from_attributes([att.POSITION_3D, att.INTENSITY])
    return HostPointBuffer.from_columns(schema, {
        att.POSITION_3D.name: rng.uniform(-1, 1, (n, 3)),
        att.INTENSITY.name: rng.integers(0, 1000, n).astype(np.uint16),
    })


def test_point_access_and_iteration(rng):
    buf = _buf(rng)
    p3 = buf.point(3)
    np.testing.assert_array_equal(p3[att.POSITION_3D.name],
                                  buf.get(att.POSITION_3D.name)[3])
    buf.set_point(3, {att.INTENSITY.name: 777})
    assert buf.get(att.INTENSITY.name)[3] == 777
    pts = list(buf)
    assert len(pts) == 10 and pts[3][att.INTENSITY.name] == 777


def test_rust_as_cast_device_matches_host(rng):
    from pasture_tpu.layout.conversion import rust_as_cast
    x = rng.uniform(-1e5, 1e5, 100)
    x[0], x[1] = np.nan, 1e20
    for dst in (np.int16, np.uint8, np.int32, np.float32):
        host = rust_as_cast(x, np.dtype(dst))
        dev = np.asarray(rust_as_cast_device(jnp.asarray(x), dst))
        np.testing.assert_array_equal(dev, host, err_msg=str(dst))


def test_convert_batch_schema_device(rng):
    buf = _buf(rng)
    batch = PointBatch.from_host(buf, policy=DevicePolicy.EXACT)
    target = PointSchema.from_attributes([
        att.POSITION_3D.with_dtype(dt.VEC3F32),
        att.INTENSITY.with_dtype(dt.F32),
        att.CLASSIFICATION,
    ])
    out = jax.jit(lambda b: convert_batch_schema(
        b, target, policy=DevicePolicy.EXACT,
        fill_missing_with_default=True))(batch)
    assert out.data[att.POSITION_3D.name].dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(out.data[att.INTENSITY.name])[:10],
        buf.get(att.INTENSITY.name).astype(np.float32))
    assert np.all(np.asarray(out.data[att.CLASSIFICATION.name]) == 0)


def test_batch_table_roundtrip():
    from pasture_tpu.io.tiles3d.feature_table import (
        FeatureTableDataReference, read_batch_table_header,
        write_batch_table_header)
    header = {"ids": FeatureTableDataReference(0, "UNSIGNED_INT"),
              "names": ["a", "b"]}
    raw = write_batch_table_header(header, start_offset=28)
    assert (28 + len(raw)) % 8 == 0
    back = read_batch_table_header(raw, 0, len(raw))
    assert back["ids"] == FeatureTableDataReference(0, "UNSIGNED_INT")
    assert back["names"] == ["a", "b"]


def test_schema_from_numpy_dtype():
    """The #[derive(PointType)] analog: struct dtype -> schema."""
    nd = np.dtype({
        "names": ["Position3D", "Intensity", "Classification"],
        "formats": [(np.float64, (3,)), np.uint16, np.uint8],
        "offsets": [0, 24, 26],
        "itemsize": 32,
    })
    schema = PointSchema.from_numpy_dtype(nd)
    assert schema.names == ("Position3D", "Intensity", "Classification")
    assert schema.offset_of("Intensity") == 24
    assert schema.attribute("Position3D").dtype is dt.VEC3F64
    # round trip through the wire layout
    back = schema.to_numpy_dtype()
    assert back.fields["Intensity"][1] == 24


def test_sort_by(rng):
    buf = _buf(rng)
    by_int = buf.sort_by(att.INTENSITY)
    inten = by_int.get(att.INTENSITY.name)
    assert np.all(np.diff(inten.astype(np.int64)) >= 0)
    by_x = buf.sort_by(att.POSITION_3D, component=0)
    assert np.all(np.diff(by_x.get(att.POSITION_3D.name)[:, 0]) >= 0)


def test_random_point_buffer():
    from pasture_tpu.testing import random_point_buffer
    buf = random_point_buffer(64, seed=7)
    assert len(buf) == 64
    buf2 = random_point_buffer(64, seed=7)
    np.testing.assert_array_equal(buf.get(att.GPS_TIME.name),
                                  buf2.get(att.GPS_TIME.name))

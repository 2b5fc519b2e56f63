"""LAZ (LASzip) codec tests.

Golden decode of the reference's .laz fixtures against the corresponding
.las files (bit-exact, like the reference's LAS==LAZ equivalence test
las_io.rs:353), write round trips, multi-chunk files and chunked seeks.
"""

import io

import numpy as np
import pytest

from pasture_tpu.io.las import LasReader, LasWriter
from pasture_tpu.io.las.header import LasPointFormat
from pasture_tpu.io.las.layout import point_schema_from_las_format
from pasture_tpu.buffers.host import HostPointBuffer
from pasture_tpu.layout import attributes as att
from pasture_tpu.layout.schema import PointSchema

pytestmark = pytest.mark.skipif(
    __import__("pasture_tpu.native.laszip", fromlist=["_native"])._native()
    is None,
    reason="native laszip codec unavailable")


@pytest.mark.parametrize("fmt", range(9))
def test_laz_decode_matches_las(reference_test_data, fmt):
    las = LasReader(f"{reference_test_data}/10_points_format_{fmt}.las",
                    point_schema_matches_memory_layout=True).read_all()
    laz = LasReader(f"{reference_test_data}/10_points_format_{fmt}.laz",
                    point_schema_matches_memory_layout=True).read_all()
    for name in las.schema.names:
        np.testing.assert_array_equal(laz.get(name), las.get(name),
                                      err_msg=name)


@pytest.mark.parametrize("fmt", (9, 10))
def test_laz_waveform_formats_rejected(reference_test_data, fmt):
    """Extended-waveform LAZ (formats 9/10) is rejected exactly like the
    reference (raw_readers.rs:451-455)."""
    with pytest.raises((NotImplementedError, ValueError)):
        LasReader(
            f"{reference_test_data}/10_points_format_{fmt}.laz").read_all()


@pytest.mark.parametrize("fmt", range(9))
def test_laz_write_roundtrip(reference_test_data, fmt):
    src = LasReader(
        f"{reference_test_data}/10_points_format_{fmt}.las").read_all()
    stream = io.BytesIO()
    w = LasWriter(stream, src.schema, compressed=True)
    w.write(src)
    w.flush()
    back = LasReader(io.BytesIO(stream.getvalue()),
                     compressed=True).read_all()
    for name in src.schema.names:
        np.testing.assert_array_equal(back.get(name), src.get(name),
                                      err_msg=name)


def _big_cloud(n=130_000, fmt=1):
    rng = np.random.default_rng(42)
    schema = point_schema_from_las_format(LasPointFormat(fmt))
    cols = {
        att.POSITION_3D.name: np.round(
            np.cumsum(rng.normal(0, 0.5, (n, 3)), axis=0), 3),
        att.INTENSITY.name: rng.integers(0, 3000, n).astype(np.uint16),
        att.RETURN_NUMBER.name: rng.integers(0, 8, n).astype(np.uint8),
        att.NUMBER_OF_RETURNS.name: rng.integers(0, 8, n).astype(np.uint8),
        att.SCAN_DIRECTION_FLAG.name: rng.integers(0, 2, n).astype(np.uint8),
        att.EDGE_OF_FLIGHT_LINE.name: rng.integers(0, 2, n).astype(np.uint8),
        att.CLASSIFICATION.name: rng.integers(0, 10, n).astype(np.uint8),
        att.SCAN_ANGLE_RANK.name: rng.integers(-90, 90, n).astype(np.int8),
        att.USER_DATA.name: rng.integers(0, 4, n).astype(np.uint8),
        att.POINT_SOURCE_ID.name: rng.integers(0, 10, n).astype(np.uint16),
        att.GPS_TIME.name: np.sort(rng.uniform(0, 1e5, n)),
    }
    return HostPointBuffer.from_columns(schema, cols)


def test_laz_multichunk_roundtrip_and_seek():
    buf = _big_cloud()
    stream = io.BytesIO()
    w = LasWriter(stream, buf.schema, compressed=True)
    w.write(buf)
    w.flush()
    data = stream.getvalue()
    assert len(data) < len(buf) * buf.schema.point_size  # actually compresses

    back = LasReader(io.BytesIO(data), compressed=True).read_all()
    np.testing.assert_allclose(back.get(att.POSITION_3D.name),
                               buf.get(att.POSITION_3D.name), atol=0.001)
    np.testing.assert_array_equal(back.get(att.GPS_TIME.name),
                                  buf.get(att.GPS_TIME.name))

    # point-granular seek into the middle of the second chunk
    r = LasReader(io.BytesIO(data), compressed=True)
    r.seek_point(60_001)
    got = r.read(7)
    np.testing.assert_allclose(
        got.get(att.POSITION_3D.name),
        buf.get(att.POSITION_3D.name)[60_001:60_008], atol=0.001)


def test_laz_extra_bytes_roundtrip(tmp_path):
    """BYTE v2 item codec: extra-bytes attributes through LAZ."""
    from pasture_tpu.io.las.writer import default_las_header
    from pasture_tpu.layout.attributes import PointAttribute
    from pasture_tpu.layout import dtypes as dt

    rng = np.random.default_rng(9)
    n = 5000
    schema = PointSchema.from_attributes([
        att.POSITION_3D, att.INTENSITY,
        PointAttribute("Reflectance", dt.U32),
        PointAttribute("Deviation", dt.I16),
    ])
    from pasture_tpu.buffers.host import HostPointBuffer
    buf = HostPointBuffer.from_columns(schema, {
        att.POSITION_3D.name: np.round(rng.uniform(-50, 50, (n, 3)), 3),
        att.INTENSITY.name: rng.integers(0, 1000, n).astype(np.uint16),
        "Reflectance": rng.integers(0, 2**20, n).astype(np.uint32),
        "Deviation": rng.integers(-500, 500, n).astype(np.int16),
    })
    out = tmp_path / "eb.laz"
    with LasWriter(out, schema, write_extra_bytes=True, compressed=True) as w:
        w.write(buf)
    with LasReader(out) as r:
        assert r.header.is_compressed
        eb = r.las_metadata().extra_bytes_attributes()
        assert {a.name for a in eb} == {"Reflectance", "Deviation"}
        back = r.read_all()
    np.testing.assert_array_equal(back.get("Reflectance"),
                                  buf.get("Reflectance"))
    np.testing.assert_array_equal(back.get("Deviation"),
                                  buf.get("Deviation"))
    np.testing.assert_allclose(back.get(att.POSITION_3D.name),
                               buf.get(att.POSITION_3D.name), atol=0.001)


def test_laz_seek_and_partial_reads():
    buf = _big_cloud(60_000, fmt=0)
    stream = io.BytesIO()
    with LasWriter(stream, buf.schema, compressed=True) as w:
        w.write(buf)
    r = LasReader(io.BytesIO(stream.getvalue()), compressed=True)
    # chunk-spanning read: 49_990 .. 50_020 crosses the 50k chunk boundary
    r.seek_point(49_990)
    got = r.read(30)
    np.testing.assert_allclose(
        got.get(att.POSITION_3D.name),
        buf.get(att.POSITION_3D.name)[49_990:50_020], atol=0.001)


def _big_cloud14(n=120_000, fmt=8):
    """LAS 1.4 cloud exercising the layered codec: scanner channels cycle,
    returns span 1..15, GPS has occasional jumps, RGB+NIR random."""
    rng = np.random.default_rng(7)
    schema = point_schema_from_las_format(LasPointFormat(fmt))
    nrets = rng.integers(1, 16, n).astype(np.uint8)
    gps = np.cumsum(rng.uniform(0, 0.01, n))
    gps[rng.random(n) < 0.001] += 5e4
    cols = {
        att.POSITION_3D.name: np.round(
            np.cumsum(rng.normal(0, 0.5, (n, 3)), axis=0), 3),
        att.INTENSITY.name: rng.integers(0, 3000, n).astype(np.uint16),
        att.RETURN_NUMBER.name: (rng.integers(0, 15, n) % nrets + 1
                                 ).astype(np.uint8),
        att.NUMBER_OF_RETURNS.name: nrets,
        att.CLASSIFICATION_FLAGS.name: rng.integers(0, 16, n).astype(np.uint8),
        att.SCANNER_CHANNEL.name: rng.integers(0, 4, n).astype(np.uint8),
        att.SCAN_DIRECTION_FLAG.name: rng.integers(0, 2, n).astype(np.uint8),
        att.EDGE_OF_FLIGHT_LINE.name: rng.integers(0, 2, n).astype(np.uint8),
        att.CLASSIFICATION.name: rng.integers(0, 64, n).astype(np.uint8),
        att.USER_DATA.name: rng.integers(0, 256, n).astype(np.uint8),
        att.SCAN_ANGLE.name: rng.integers(-15000, 15000, n).astype(np.int16),
        att.POINT_SOURCE_ID.name: rng.integers(0, 600, n).astype(np.uint16),
        att.GPS_TIME.name: gps,
    }
    if fmt in (7, 8):
        cols[att.COLOR_RGB.name] = rng.integers(
            0, 65536, (n, 3)).astype(np.uint16)
    if fmt == 8:
        cols[att.NIR.name] = rng.integers(0, 65536, n).astype(np.uint16)
    return HostPointBuffer.from_columns(schema, cols)


@pytest.mark.parametrize("fmt", (6, 7, 8))
def test_laz_layered_multichunk_roundtrip(fmt):
    """Layered codec (POINT14/RGB14/RGBNIR14 v3) across chunk boundaries
    with all four scanner-channel contexts active."""
    buf = _big_cloud14(fmt=fmt)
    stream = io.BytesIO()
    with LasWriter(stream, buf.schema, compressed=True) as w:
        w.write(buf)
    data = stream.getvalue()
    assert len(data) < len(buf) * buf.schema.point_size
    back = LasReader(io.BytesIO(data), compressed=True).read_all()
    for name in buf.schema.names:
        if name == att.POSITION_3D.name:
            np.testing.assert_allclose(back.get(name), buf.get(name),
                                       atol=0.001)
        else:
            np.testing.assert_array_equal(back.get(name), buf.get(name),
                                          err_msg=name)

    # chunk-spanning seek
    r = LasReader(io.BytesIO(data), compressed=True)
    r.seek_point(49_995)
    got = r.read(10)
    np.testing.assert_array_equal(
        got.get(att.GPS_TIME.name),
        buf.get(att.GPS_TIME.name)[49_995:50_005])


def test_laz_layered_extra_bytes_roundtrip(tmp_path):
    """BYTE14 v3: extra-bytes attributes through layered LAZ."""
    from pasture_tpu.layout.attributes import PointAttribute
    from pasture_tpu.layout import dtypes as dt

    rng = np.random.default_rng(3)
    n = 60_000
    base = point_schema_from_las_format(LasPointFormat(6))
    schema = PointSchema.from_attributes(
        list(base.attributes) + [PointAttribute("Amplitude", dt.U16),
                                 PointAttribute("Width", dt.U8)])
    cloud = _big_cloud14(n=n, fmt=6)
    cols = {name: cloud.get(name) for name in cloud.schema.names}
    cols["Amplitude"] = rng.integers(0, 4000, n).astype(np.uint16)
    cols["Width"] = rng.integers(0, 200, n).astype(np.uint8)
    buf = HostPointBuffer.from_columns(schema, cols)
    out = tmp_path / "eb14.laz"
    with LasWriter(out, schema, write_extra_bytes=True, compressed=True) as w:
        w.write(buf)
    with LasReader(out) as r:
        assert r.header.point_format.number == 6
        back = r.read_all()
    np.testing.assert_array_equal(back.get("Amplitude"), buf.get("Amplitude"))
    np.testing.assert_array_equal(back.get("Width"), buf.get("Width"))


def test_laz_custom_chunk_size_roundtrip(rng):
    """laz_chunk_size plumbs through writer VLR + compressor consistently
    (a mismatch decodes as a chunk-count error; regression for round 3)."""
    n = 30_000
    schema = point_schema_from_las_format(LasPointFormat(1))
    cols = {
        att.POSITION_3D.name: np.round(rng.uniform(-50, 50, (n, 3)), 3),
        att.INTENSITY.name: rng.integers(0, 65536, n).astype(np.uint16),
        att.RETURN_NUMBER.name: rng.integers(0, 8, n).astype(np.uint8),
        att.NUMBER_OF_RETURNS.name: rng.integers(0, 8, n).astype(np.uint8),
        att.SCAN_DIRECTION_FLAG.name:
            rng.integers(0, 2, n).astype(np.uint8),
        att.EDGE_OF_FLIGHT_LINE.name:
            rng.integers(0, 2, n).astype(np.uint8),
        att.CLASSIFICATION.name: rng.integers(0, 32, n).astype(np.uint8),
        att.SCAN_ANGLE_RANK.name: rng.integers(-90, 90, n).astype(np.int8),
        att.USER_DATA.name: rng.integers(0, 256, n).astype(np.uint8),
        att.POINT_SOURCE_ID.name:
            rng.integers(0, 100, n).astype(np.uint16),
        att.GPS_TIME.name: np.sort(rng.uniform(0, 1e5, n)),
    }
    buf = HostPointBuffer.from_columns(schema, cols)
    stream = io.BytesIO()
    w = LasWriter(stream, schema, compressed=True, laz_chunk_size=4096)
    w.write(buf)
    w.flush()
    back = LasReader(io.BytesIO(stream.getvalue()),
                     compressed=True).read_all()
    for name in schema.names:
        got, want = np.asarray(back.get(name)), np.asarray(buf.get(name))
        if name == att.POSITION_3D.name:
            np.testing.assert_allclose(got, want, atol=1.001e-3)
        else:
            np.testing.assert_array_equal(got, want, err_msg=name)

"""LAS I/O golden tests.

Fixture-driven, mirroring pasture's macro-generated format tests
(reference: pasture-io/src/las/raw_readers.rs:682-1054): the checked-in
10-point files per format 0-10 decode to deterministic ramps
(test_util.rs:50-190), asserted bit-exactly here.  Plus write->read-back
round trips (raw_writers.rs tests) and custom-schema conversion reads.
"""

import io

import numpy as np
import pytest

from pasture_tpu.io import read_all, write_all
from pasture_tpu.io.las import (
    ATTRIBUTE_BASIC_FLAGS,
    ATTRIBUTE_EXTENDED_FLAGS,
    ATTRIBUTE_LOCAL_LAS_POSITION,
    LasReader,
    LasWriter,
    las_format_from_point_schema,
    point_schema_from_las_format,
)
from pasture_tpu.io.las.header import LasPointFormat
from pasture_tpu.layout import attributes as att
from pasture_tpu.layout import dtypes as dt
from pasture_tpu.layout.attributes import PointAttribute
from pasture_tpu.layout.schema import PointSchema


# ---- expected fixture values (reference test_util.rs:50-190) -------------------
N = 10
I = np.arange(N)


def expected(fmt: LasPointFormat):
    e = {
        att.POSITION_3D.name: np.stack([I, I, I], axis=1).astype(np.float64),
        att.INTENSITY.name: (I * 255).astype(np.uint16),
        att.CLASSIFICATION.name: I.astype(np.uint8),
        att.USER_DATA.name: I.astype(np.uint8),
        att.POINT_SOURCE_ID.name: I.astype(np.uint16),
        att.SCAN_DIRECTION_FLAG.name: (I % 2).astype(np.uint8),
        att.EDGE_OF_FLIGHT_LINE.name: (I % 2).astype(np.uint8),
    }
    if fmt.is_extended:
        e[att.RETURN_NUMBER.name] = I.astype(np.uint8)
        e[att.NUMBER_OF_RETURNS.name] = I.astype(np.uint8)
        e[att.CLASSIFICATION_FLAGS.name] = I.astype(np.uint8)
        e[att.SCANNER_CHANNEL.name] = (I % 4).astype(np.uint8)
        e[att.SCAN_ANGLE.name] = I.astype(np.int16)
    else:
        e[att.RETURN_NUMBER.name] = (I % 8).astype(np.uint8)
        e[att.NUMBER_OF_RETURNS.name] = (I % 8).astype(np.uint8)
        e[att.SCAN_ANGLE_RANK.name] = I.astype(np.int8)
    if fmt.has_gps_time:
        e[att.GPS_TIME.name] = (I + 1).astype(np.float64)
    if fmt.has_color:
        e[att.COLOR_RGB.name] = np.stack(
            [I, (I + 1) << 4, (I + 2) << 8], axis=1).astype(np.uint16)
    if fmt.has_nir:
        e[att.NIR.name] = I.astype(np.uint16)
    if fmt.has_waveform:
        e[att.WAVE_PACKET_DESCRIPTOR_INDEX.name] = I.astype(np.uint8)
        e[att.WAVEFORM_DATA_OFFSET.name] = I.astype(np.uint64)
        e[att.WAVEFORM_PACKET_SIZE.name] = I.astype(np.uint32)
        e[att.RETURN_POINT_WAVEFORM_LOCATION.name] = I.astype(np.float32)
        e[att.WAVEFORM_PARAMETERS.name] = np.stack(
            [I + 1, I + 2, I + 3], axis=1).astype(np.float32)
    return e


@pytest.mark.parametrize("fmt_number", range(11))
def test_read_las_default_schema(reference_test_data, fmt_number):
    path = f"{reference_test_data}/10_points_format_{fmt_number}.las"
    with LasReader(path) as reader:
        assert reader.point_count() == N
        buf = reader.read_all()
    assert len(buf) == N
    exp = expected(LasPointFormat(fmt_number))
    assert set(buf.schema.names) == set(exp)
    for name, want in exp.items():
        got = buf.get(name)
        np.testing.assert_array_equal(got, want, err_msg=name)
        assert got.dtype == want.dtype, name


@pytest.mark.parametrize("fmt_number", range(11))
def test_read_las_exact_schema(reference_test_data, fmt_number):
    path = f"{reference_test_data}/10_points_format_{fmt_number}.las"
    with LasReader(path, point_schema_matches_memory_layout=True) as reader:
        schema = reader.get_default_point_schema()
        assert schema.point_size == reader.header.point_record_length
        buf = reader.read_all()
    # local positions * scale + offset == world ramps
    local = buf.get(ATTRIBUTE_LOCAL_LAS_POSITION.name).astype(np.float64)
    world = (local * reader.header.scale_np[None, :]
             + reader.header.offset_np[None, :])
    np.testing.assert_allclose(world, np.stack([I, I, I], axis=1), atol=1e-9)
    # packed flags decode to the expected ramps
    fmt = LasPointFormat(fmt_number)
    if fmt.is_extended:
        flags = buf.get(ATTRIBUTE_EXTENDED_FLAGS.name)
        np.testing.assert_array_equal(flags & 0b1111, I)
        np.testing.assert_array_equal((flags >> 4) & 0b1111, I)
        np.testing.assert_array_equal((flags >> 12) & 0b11, I % 4)
    else:
        flags = buf.get(ATTRIBUTE_BASIC_FLAGS.name)
        np.testing.assert_array_equal(flags & 0b111, I % 8)
        np.testing.assert_array_equal((flags >> 3) & 0b111, I % 8)


@pytest.mark.parametrize("fmt_number", range(11))
def test_read_las_seek(reference_test_data, fmt_number):
    path = f"{reference_test_data}/10_points_format_{fmt_number}.las"
    with LasReader(path) as reader:
        reader.seek_point(5)
        assert reader.remaining_points() == 5
        buf = reader.read(3)
    np.testing.assert_array_equal(
        buf.get(att.POSITION_3D.name),
        np.stack([I[5:8]] * 3, axis=1).astype(np.float64))


@pytest.mark.parametrize("fmt_number", range(11))
def test_read_las_custom_schema(reference_test_data, fmt_number):
    """Converting read: f32 positions + f32 intensity (reference
    raw_readers.rs custom-layout tests)."""
    target = PointSchema.from_attributes([
        att.POSITION_3D.with_dtype(dt.VEC3F32),
        att.INTENSITY.with_dtype(dt.F32),
        att.CLASSIFICATION,
    ])
    path = f"{reference_test_data}/10_points_format_{fmt_number}.las"
    with LasReader(path) as reader:
        buf = reader.read_all(schema=target)
    np.testing.assert_array_equal(
        buf.get(att.POSITION_3D.name),
        np.stack([I, I, I], axis=1).astype(np.float32))
    np.testing.assert_array_equal(
        buf.get(att.INTENSITY.name), (I * 255).astype(np.float32))
    np.testing.assert_array_equal(buf.get(att.CLASSIFICATION.name), I)


@pytest.mark.parametrize("fmt_number", range(11))
def test_read_extra_bytes(reference_test_data, fmt_number):
    path = (f"{reference_test_data}/"
            f"10_points_with_extra_bytes_format_{fmt_number}.las")
    with LasReader(path) as reader:
        eb = reader.las_metadata().extra_bytes_attributes()
        assert len(eb) == 1
        buf = reader.read_all()
    np.testing.assert_array_equal(buf.get(eb[0].name), I.astype(np.uint32))


def test_read_all_into_appends_in_buffer_schema(reference_test_data):
    """``read_all_into`` appends in the destination schema with conversion
    (reference base/mod.rs:48-60)."""
    from pasture_tpu.io import read_all_into

    src = f"{reference_test_data}/10_points_format_0.las"
    first = read_all(src)
    both = read_all_into(first, src)
    assert len(both) == 2 * len(first)
    assert both.schema == first.schema
    for name in first.schema.names:
        np.testing.assert_array_equal(both.get(name)[len(first):],
                                      first.get(name), err_msg=name)
    # conversion path: destination holds a converted subset schema
    sub = first.convert_schema(first.schema.subset(
        [att.POSITION_3D.name, att.INTENSITY.name]))
    grown = read_all_into(sub, src)
    assert len(grown) == 2 * len(sub)
    np.testing.assert_array_equal(grown.get(att.INTENSITY.name)[:len(sub)],
                                  sub.get(att.INTENSITY.name))


@pytest.mark.parametrize("fmt_number", range(11))
def test_write_read_roundtrip(tmp_path, reference_test_data, fmt_number):
    src = f"{reference_test_data}/10_points_format_{fmt_number}.las"
    with LasReader(src) as reader:
        buf = reader.read_all()
    out = tmp_path / "out.las"
    write_all(buf, out)
    back = read_all(out)
    assert back.schema == buf.schema
    for name in buf.schema.names:
        np.testing.assert_array_equal(back.get(name), buf.get(name),
                                      err_msg=name)


def test_write_metadata_roundtrip(tmp_path, reference_test_data):
    src = f"{reference_test_data}/10_points_format_1.las"
    buf = read_all(src)
    out = tmp_path / "o.las"
    write_all(buf, out)
    with LasReader(out) as r:
        h = r.header
        assert h.point_count == N
        mn, mx = h.bounds
        np.testing.assert_allclose(mn, [0, 0, 0])
        np.testing.assert_allclose(mx, [9, 9, 9])
        # per-return histogram: returns 1..7 appear [2,1,1,1,1,1,1] times
        assert h.points_by_return[0] == 2  # return number 1 (ramps 1 and 9)
        assert h.points_by_return[1] == 1


def test_write_cross_schema(tmp_path):
    """Writing a buffer whose schema differs from the file's point format
    (reference raw_writers.rs:1227-1476 cross-layout tests)."""
    schema = PointSchema.from_attributes([
        att.POSITION_3D, att.GPS_TIME, att.INTENSITY])
    cols = {
        att.POSITION_3D.name: np.stack([I * 0.5, I * 0.25, I * 2.0], axis=1),
        att.GPS_TIME.name: I.astype(np.float64) * 0.1,
        att.INTENSITY.name: (I * 100).astype(np.uint16),
    }
    from pasture_tpu.buffers.host import HostPointBuffer
    buf = HostPointBuffer.from_columns(schema, cols)
    fmt = las_format_from_point_schema(schema)
    assert fmt.number == 1
    out = tmp_path / "x.las"
    write_all(buf, out)
    back = read_all(out)
    np.testing.assert_allclose(back.get(att.POSITION_3D.name),
                               cols[att.POSITION_3D.name], atol=0.001)
    np.testing.assert_array_equal(back.get(att.GPS_TIME.name),
                                  cols[att.GPS_TIME.name])
    np.testing.assert_array_equal(back.get(att.INTENSITY.name),
                                  cols[att.INTENSITY.name])
    # absent unpacked flags read back as zero
    np.testing.assert_array_equal(back.get(att.RETURN_NUMBER.name),
                                  np.zeros(N, np.uint8))


def test_write_in_memory_stream():
    """Cursor-style in-memory round trip (reference las_io.rs:29-71)."""
    schema = point_schema_from_las_format(LasPointFormat(0))
    from pasture_tpu.buffers.host import HostPointBuffer
    n = 100_000  # much larger than any chunk size
    rng = np.random.default_rng(0)
    cols = {
        att.POSITION_3D.name: np.round(
            rng.uniform(-1000, 1000, (n, 3)), 3),
        att.INTENSITY.name: rng.integers(0, 2**16, n).astype(np.uint16),
        att.RETURN_NUMBER.name: rng.integers(0, 8, n).astype(np.uint8),
        att.NUMBER_OF_RETURNS.name: rng.integers(0, 8, n).astype(np.uint8),
        att.SCAN_DIRECTION_FLAG.name: rng.integers(0, 2, n).astype(np.uint8),
        att.EDGE_OF_FLIGHT_LINE.name: rng.integers(0, 2, n).astype(np.uint8),
        att.CLASSIFICATION.name: rng.integers(0, 256, n).astype(np.uint8),
        att.SCAN_ANGLE_RANK.name: rng.integers(-90, 90, n).astype(np.int8),
        att.USER_DATA.name: rng.integers(0, 256, n).astype(np.uint8),
        att.POINT_SOURCE_ID.name: rng.integers(0, 2**16, n).astype(np.uint16),
    }
    buf = HostPointBuffer.from_columns(schema, cols)
    stream = io.BytesIO()
    with LasWriter(stream, schema) as w:
        w.write(buf)
    stream.seek(0)
    with LasReader(io.BytesIO(stream.getvalue())) as r:
        back = r.read_all()
    # positions quantize to the 0.001 scale grid via truncation (reference
    # write_helpers.rs:10-24 uses a truncating `as i64` cast)
    np.testing.assert_allclose(back.get(att.POSITION_3D.name),
                               cols[att.POSITION_3D.name], atol=0.001)
    for name in schema.names:
        if name == att.POSITION_3D.name:
            continue
        np.testing.assert_array_equal(back.get(name), cols[name], err_msg=name)


def test_laz_without_native_codec_raises(reference_test_data):
    import pasture_tpu.native.laszip as lz
    if lz._native() is not None:
        pytest.skip("native codec present")
    with pytest.raises(NotImplementedError):
        LasReader(f"{reference_test_data}/10_points_format_0.laz")


def test_point_count_convenience(reference_test_data):
    from pasture_tpu.io import point_count
    assert point_count(
        f"{reference_test_data}/10_points_format_2.las") == 10


def test_write_las_12_version(tmp_path, reference_test_data):
    """Older LAS version headers (1.2: 227-byte header, legacy counts)."""
    from pasture_tpu.io.las.header import LasHeader, LasPointFormat
    src = read_all(f"{reference_test_data}/10_points_format_1.las")
    header = LasHeader(version=(1, 2), point_format=LasPointFormat(1),
                       point_record_length=28)
    out = tmp_path / "v12.las"
    with LasWriter(out, src.schema, header=header) as w:
        w.write(src)
    with LasReader(out) as r:
        assert r.header.version == (1, 2)
        assert r.header.header_size == 227
        assert r.point_count() == 10
        back = r.read_all()
    np.testing.assert_array_equal(back.get(att.POSITION_3D.name),
                                  src.get(att.POSITION_3D.name))


def test_evlr_write_read_roundtrip(tmp_path, reference_test_data):
    """Extended VLRs after the point data (LAS 1.4)."""
    from pasture_tpu.io.las.header import LasVlr
    src = read_all(f"{reference_test_data}/10_points_format_6.las")
    from pasture_tpu.io.las.writer import default_las_header
    header = default_las_header(src.schema)
    header.evlrs.append(LasVlr("pasture_tpu", 42, "roundtrip",
                               b"\x01\x02\x03" * 100))
    out = tmp_path / "evlr.las"
    with LasWriter(out, src.schema, header=header) as w:
        w.write(src)
    with LasReader(out) as r:
        assert len(r.header.evlrs) == 1
        e = r.header.evlrs[0]
        assert (e.user_id, e.record_id) == ("pasture_tpu", 42)
        assert e.data == b"\x01\x02\x03" * 100
        back = r.read_all()
    np.testing.assert_array_equal(back.get(att.POSITION_3D.name),
                                  src.get(att.POSITION_3D.name))


def test_unknown_attributes_dropped_on_write(tmp_path, rng):
    """Unsupported attributes silently drop (reference las_io.rs:102-151)."""
    from pasture_tpu.layout.dtypes import F32
    schema = PointSchema.from_attributes([
        att.POSITION_3D, PointAttribute("MyCustomThing", F32)])
    n = 20
    from pasture_tpu.buffers.host import HostPointBuffer
    buf = HostPointBuffer.from_columns(schema, {
        att.POSITION_3D.name: rng.uniform(-1, 1, (n, 3)),
        "MyCustomThing": rng.normal(size=n).astype(np.float32)})
    out = tmp_path / "drop.las"
    write_all(buf, out)
    back = read_all(out)
    assert "MyCustomThing" not in back.schema.names
    np.testing.assert_allclose(back.get(att.POSITION_3D.name),
                               buf.get(att.POSITION_3D.name), atol=0.001)


def test_native_deinterleave_matches_numpy_extraction(rng):
    """The C++ record deinterleaver (host-ingest hot loop) must be
    bit-exact with numpy strided field extraction on every column."""
    import io

    from pasture_tpu.buffers.host import HostPointBuffer
    from pasture_tpu.native.laszip import _native

    if _native() is None:
        pytest.skip("native codec unavailable")
    n = 20_000   # above the native-path threshold
    schema = point_schema_from_las_format(LasPointFormat(3))
    cols = {
        att.POSITION_3D.name: np.round(
            rng.uniform(-100, 100, (n, 3)), 3),
        att.INTENSITY.name: rng.integers(0, 65536, n).astype(np.uint16),
        att.RETURN_NUMBER.name: rng.integers(0, 8, n).astype(np.uint8),
        att.NUMBER_OF_RETURNS.name: rng.integers(0, 8, n).astype(np.uint8),
        att.SCAN_DIRECTION_FLAG.name:
            rng.integers(0, 2, n).astype(np.uint8),
        att.EDGE_OF_FLIGHT_LINE.name:
            rng.integers(0, 2, n).astype(np.uint8),
        att.CLASSIFICATION.name: rng.integers(0, 32, n).astype(np.uint8),
        att.SCAN_ANGLE_RANK.name:
            rng.integers(-90, 90, n).astype(np.int8),
        att.USER_DATA.name: rng.integers(0, 256, n).astype(np.uint8),
        att.POINT_SOURCE_ID.name:
            rng.integers(0, 100, n).astype(np.uint16),
        att.GPS_TIME.name: np.sort(rng.uniform(0, 1e5, n)),
        att.COLOR_RGB.name: rng.integers(0, 65536, (n, 3)).astype(
            np.uint16),
    }
    buf = HostPointBuffer.from_columns(schema, cols)
    stream = io.BytesIO()
    w = LasWriter(stream, schema)
    w.write(buf)
    w.flush()
    r = LasReader(io.BytesIO(stream.getvalue()))
    rec = r._records[0:n]
    ref = {m.name: np.ascontiguousarray(rec[m.name])
           for m in r._exact_schema.members}
    got, owned = r._extract_columns(rec, n)
    assert owned
    assert set(ref) == set(got)
    for k in ref:
        np.testing.assert_array_equal(ref[k], got[k], err_msg=k)


def test_fused_converting_read_matches_converter(tmp_path, rng):
    """The ONE-pass native converting read (laz_las_convert: position
    decode + flag fan-out + pass-through copies fused over the records)
    must be bit-identical to the SchemaConverter path, for basic (fmt1)
    and extended (fmt6) flags and for sub-schemas."""
    import numpy as np

    from pasture_tpu.buffers.host import HostPointBuffer
    from pasture_tpu.io import open_reader
    from pasture_tpu.io.las.header import LasHeader, LasPointFormat
    from pasture_tpu.io.las.writer import LasWriter
    from pasture_tpu.layout import attributes as att
    from pasture_tpu.layout.schema import PointSchema

    n = 20000   # above the 16384 fused threshold; 8k chunks stay below
    common = {
        att.POSITION_3D.name: np.round(rng.uniform(0, 100, (n, 3)), 3),
        att.INTENSITY.name: rng.integers(0, 65536, n).astype(np.uint16),
        att.RETURN_NUMBER.name: rng.integers(0, 8, n).astype(np.uint8),
        att.NUMBER_OF_RETURNS.name: rng.integers(0, 8, n).astype(np.uint8),
        att.GPS_TIME.name: rng.uniform(0, 1e6, n),
    }
    cases = [
        (LasHeader(version=(1, 2), point_format=LasPointFormat(1),
                   point_record_length=28),
         dict(common, **{
             att.CLASSIFICATION.name:
                 rng.integers(0, 32, n).astype(np.uint8),
             att.SCAN_DIRECTION_FLAG.name:
                 rng.integers(0, 2, n).astype(np.uint8),
             att.EDGE_OF_FLIGHT_LINE.name:
                 rng.integers(0, 2, n).astype(np.uint8)})),
        (LasHeader(version=(1, 4), point_format=LasPointFormat(6),
                   point_record_length=30),
         dict(common, **{
             att.CLASSIFICATION.name:
                 rng.integers(0, 250, n).astype(np.uint8),
             att.SCANNER_CHANNEL.name:
                 rng.integers(0, 4, n).astype(np.uint8),
             att.CLASSIFICATION_FLAGS.name:
                 rng.integers(0, 16, n).astype(np.uint8)})),
    ]
    for i, (header, cols) in enumerate(cases):
        schema = PointSchema.from_attributes(
            [a for a in (att.POSITION_3D, att.INTENSITY,
                         att.CLASSIFICATION, att.RETURN_NUMBER,
                         att.NUMBER_OF_RETURNS, att.SCAN_DIRECTION_FLAG,
                         att.EDGE_OF_FLIGHT_LINE, att.SCANNER_CHANNEL,
                         att.CLASSIFICATION_FLAGS, att.GPS_TIME)
             if a.name in cols])
        buf = HostPointBuffer.from_columns(schema, cols)
        path = tmp_path / f"fused_{i}.las"
        with LasWriter(path, schema, header=header) as w:
            w.write(buf)

        with open_reader(path) as r:
            fused = r.read(n)
            assert getattr(r, "_fused_plans", None), "fused path not taken"
        with open_reader(path) as r:
            parts = [r.read(8000) for _ in range(3)]
        for m in fused.schema.members:
            np.testing.assert_array_equal(
                fused.get(m.name),
                np.concatenate([p.get(m.name) for p in parts]),
                err_msg=f"case {i} {m.name}")

        # sub-schema (position f64 + intensity only)
        slim = PointSchema.from_attributes([att.POSITION_3D, att.INTENSITY])
        with open_reader(path) as r:
            f2 = r.read(n, schema=slim)
        with open_reader(path) as r:
            p2 = [r.read(8000, schema=slim) for _ in range(3)]
        for m in f2.schema.members:
            np.testing.assert_array_equal(
                f2.get(m.name),
                np.concatenate([p.get(m.name) for p in p2]),
                err_msg=f"case {i} slim {m.name}")


def test_fused_converting_read_laz(tmp_path, rng):
    """The fused converting read also serves decompressed LAZ chunks
    (records come from the codec's buffer instead of the mmap)."""
    import numpy as np

    from pasture_tpu.buffers.host import HostPointBuffer
    from pasture_tpu.io import open_reader, write_all
    from pasture_tpu.layout import attributes as att
    from pasture_tpu.layout.schema import PointSchema

    n = 20000
    schema = PointSchema.from_attributes(
        [att.POSITION_3D, att.INTENSITY, att.CLASSIFICATION])
    cols = {att.POSITION_3D.name: np.round(rng.uniform(0, 50, (n, 3)), 3),
            att.INTENSITY.name: rng.integers(0, 65536, n).astype(np.uint16),
            att.CLASSIFICATION.name: rng.integers(0, 32, n).astype(np.uint8)}
    buf = HostPointBuffer.from_columns(schema, cols)
    path = tmp_path / "fused.laz"
    write_all(buf, path)

    with open_reader(path) as r:
        fused = r.read(n)
        assert getattr(r, "_fused_plans", None), "fused path not taken"
    with open_reader(path) as r:
        parts = [r.read(8000) for _ in range(3)]
    for m in fused.schema.members:
        np.testing.assert_array_equal(
            fused.get(m.name),
            np.concatenate([p.get(m.name) for p in parts]),
            err_msg=m.name)
    np.testing.assert_allclose(
        fused.get_converted(att.POSITION_3D),
        cols[att.POSITION_3D.name], atol=1e-3)

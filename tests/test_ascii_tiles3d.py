"""ASCII + 3D Tiles I/O tests (parity scenarios: ascii raw_reader.rs tests,
pnts_reader.rs:416 / pnts_writer.rs:452-507, tileset round trips)."""

import io
import json

import numpy as np
import pytest

from pasture_tpu.io.ascii import AsciiReader, AsciiWriter, schema_from_format
from pasture_tpu.io.tiles3d import (
    BoundingVolume,
    PntsReader,
    PntsReadPositionsMode,
    PntsWriter,
    Refinement,
    Tile,
    Tileset,
    TilesetBuilder,
    read_tileset,
    write_tileset,
)
from pasture_tpu.buffers.host import HostPointBuffer
from pasture_tpu.layout import attributes as att
from pasture_tpu.layout import dtypes as dt
from pasture_tpu.layout.schema import PointSchema

I = np.arange(10)


# ---- ASCII ---------------------------------------------------------------------

def test_ascii_read_all_attributes(reference_test_data):
    """Reference test_read (raw_reader.rs:357-470): 17-literal format."""
    r = AsciiReader(f"{reference_test_data}/10_points_ascii_all_attributes.txt",
                    "xyzirncuRGBtpedaI", ", ")
    buf = r.read_all()
    np.testing.assert_array_equal(
        buf.get(att.POSITION_3D.name), np.stack([I] * 3, 1).astype(float))
    np.testing.assert_array_equal(buf.get(att.INTENSITY.name), I)
    np.testing.assert_array_equal(buf.get(att.GPS_TIME.name), I.astype(float))
    np.testing.assert_array_equal(buf.get(att.SCAN_ANGLE_RANK.name),
                                  -I.astype(np.int8))
    np.testing.assert_array_equal(buf.get(att.NIR.name), I)
    np.testing.assert_array_equal(
        buf.get(att.COLOR_RGB.name), np.stack([I, I, I], 1))


def test_ascii_read_with_skips(reference_test_data):
    r = AsciiReader(f"{reference_test_data}/10_points_ascii.txt",
                    "xyzsssss", ", ")
    buf = r.read_all()
    assert buf.schema.names == (att.POSITION_3D.name,)
    np.testing.assert_array_equal(
        buf.get(att.POSITION_3D.name), np.stack([I] * 3, 1).astype(float))


def test_ascii_errors(reference_test_data):
    with pytest.raises(ValueError, match="can't interpret format literal"):
        AsciiReader(io.StringIO(""), "xyzQ")
    with pytest.raises(ValueError, match="expected more items"):
        AsciiReader(io.StringIO("1.0, 2.0\n"), "xyz").read_all()
    path = f"{reference_test_data}/10_points_ascii_parsing_errors.txt"
    with pytest.raises(ValueError, match="ParseError at parsing Intensity"):
        AsciiReader(path, "sssi", ", ").read_all()
    with pytest.raises(ValueError, match="expected bool"):
        AsciiReader(path, "sssse", ", ").read_all()
    with pytest.raises(ValueError,
                       match="ParseError at parsing Position3D"):
        AsciiReader(path, "x", ", ").read_all()


def test_ascii_write_read_roundtrip(tmp_path, rng):
    fmt = "xyzic"
    schema = schema_from_format(fmt)
    pos = np.round(rng.uniform(-10, 10, (20, 3)), 5)
    inten = rng.integers(0, 1000, 20).astype(np.uint16)
    cls = rng.integers(0, 32, 20).astype(np.uint8)
    buf = HostPointBuffer.from_columns(schema, {
        att.POSITION_3D.name: pos, att.INTENSITY.name: inten,
        att.CLASSIFICATION.name: cls})
    p = tmp_path / "pts.txt"
    with AsciiWriter(p, fmt) as w:
        w.write(buf)
    back = AsciiReader(p, fmt).read_all()
    np.testing.assert_allclose(back.get(att.POSITION_3D.name), pos,
                               atol=1e-5)
    np.testing.assert_array_equal(back.get(att.INTENSITY.name), inten)
    np.testing.assert_array_equal(back.get(att.CLASSIFICATION.name), cls)


# ---- PNTS ----------------------------------------------------------------------

def test_pnts_read_reference_fixture(reference_test_data):
    r = PntsReader(f"{reference_test_data}/points.pnts")
    n = r.get_metadata().number_of_points()
    buf = r.read_all()
    assert len(buf) == n > 0
    pos_member = buf.schema.get(att.POSITION_3D.name)
    assert pos_member is not None and pos_member.dtype.name == "Vec3f32"


def test_pnts_rtc_center_modes(reference_test_data, tmp_path):
    schema = PointSchema.from_attributes_packed(
        [att.POSITION_3D.with_dtype(dt.VEC3F32)])
    pos = np.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]], np.float32)
    buf = HostPointBuffer.from_columns(schema, {att.POSITION_3D.name: pos})
    p = tmp_path / "rtc.pnts"
    with PntsWriter(p, schema, rtc_center=[100.0, 200.0, 300.0]) as w:
        w.write(buf)

    # writer stores positions relative to RTC_CENTER; absolute read adds it
    # back, relative read leaves the stored values (pnts_reader.rs:30-39)
    absolute = PntsReader(p).read_all()
    np.testing.assert_allclose(absolute.get(att.POSITION_3D.name), pos,
                               atol=1e-4)
    relative = PntsReader(
        p, PntsReadPositionsMode.RELATIVE_TO_CENTER).read_all()
    np.testing.assert_allclose(
        relative.get(att.POSITION_3D.name),
        pos - np.array([100, 200, 300], np.float32), atol=1e-4)


def test_pnts_write_read_roundtrip_drops_unsupported(tmp_path, rng):
    """Unsupported attributes are silently dropped
    (reference pnts_writer.rs:104-155)."""
    schema = PointSchema.from_attributes(
        [att.POSITION_3D, att.COLOR_RGB, att.INTENSITY])
    pos = rng.uniform(-5, 5, (30, 3))
    color = rng.integers(0, 256, (30, 3)).astype(np.uint16)
    inten = rng.integers(0, 1000, 30).astype(np.uint16)
    buf = HostPointBuffer.from_columns(schema, {
        att.POSITION_3D.name: pos, att.COLOR_RGB.name: color,
        att.INTENSITY.name: inten})
    p = tmp_path / "t.pnts"
    with PntsWriter(p, schema) as w:
        w.write(buf)
    back = PntsReader(p).read_all()
    assert set(back.schema.names) == {att.POSITION_3D.name,
                                      att.COLOR_RGB.name}
    np.testing.assert_allclose(back.get(att.POSITION_3D.name),
                               pos.astype(np.float32), rtol=1e-6)
    # color converted u16 -> u8 wire dtype (Rust `as` wrap)
    np.testing.assert_array_equal(back.get(att.COLOR_RGB.name),
                                  color.astype(np.uint8))


# ---- tileset -------------------------------------------------------------------

def test_tileset_read_reference_fixture(reference_test_data):
    ts = read_tileset(f"{reference_test_data}/tileset.json")
    assert ts.root is not None
    assert ts.geometric_error >= 0


def test_tileset_roundtrip(tmp_path):
    child = (TilesetBuilder()
             .geometric_error(1.0)
             .bounding_volume(BoundingVolume.sphere((1, 2, 3), 4.0))
             .content("points.pnts")
             .build())
    root = (TilesetBuilder()
            .geometric_error(10.0)
            .refinement(Refinement.ADD)
            .bounding_volume(BoundingVolume.region(0, 0, 1, 1, 0, 100))
            .transform(np.eye(4))
            .add_child(child)
            .build())
    ts = Tileset(root=root, geometric_error=10.0, tileset_version="x1")
    p = tmp_path / "tileset.json"
    write_tileset(ts, p)
    back = read_tileset(p)
    assert back.tileset_version == "x1"
    assert back.root.refine is Refinement.ADD
    assert len(back.root.children) == 1
    assert back.root.children[0].content_uri == "points.pnts"
    assert back.root.children[0].bounding_volume.kind == "sphere"
    np.testing.assert_array_equal(back.root.transform, np.eye(4))


# ---- info CLI ------------------------------------------------------------------

def test_info_cli(reference_test_data, capsys):
    from pasture_tpu.tools.info import main
    rc = main([f"{reference_test_data}/10_points_format_3.las", "--detailed"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Points: 10" in out
    assert "Position3D" in out
    assert "min=[0.0, 0.0, 0.0] max=[9.0, 9.0, 9.0]" in out


def _pnts_bytes(ft_header, body):
    import struct
    from pasture_tpu.io.tiles3d.feature_table import \
        write_feature_table_header
    H = struct.Struct("<4sIIIIII")
    ftj = write_feature_table_header(ft_header, 8, H.size)
    total = H.size + len(ftj) + len(body)
    return H.pack(b"pnts", 1, total, len(ftj), len(body), 0, 0) + ftj + body


def test_pnts_quantized_positions():
    """POSITION_QUANTIZED decode (beyond the reference's TODO,
    pnts_reader.rs:131): u16 triples dequantize into the volume."""
    from pasture_tpu.io.tiles3d.feature_table import \
        FeatureTableDataReference

    q = np.asarray([[0, 0, 0], [65535, 65535, 65535], [32767, 0, 65535]],
                   np.uint16)
    data = _pnts_bytes({
        "POINTS_LENGTH": 3,
        "QUANTIZED_VOLUME_OFFSET": [10.0, 20.0, 30.0],
        "QUANTIZED_VOLUME_SCALE": [2.0, 4.0, 8.0],
        "POSITION_QUANTIZED": FeatureTableDataReference(0),
    }, q.tobytes())
    r = PntsReader(data)
    buf = r.read_all()
    pos = buf.get(att.POSITION_3D.name)
    np.testing.assert_allclose(pos[0], [10.0, 20.0, 30.0], atol=1e-4)
    np.testing.assert_allclose(pos[1], [12.0, 24.0, 38.0], atol=1e-4)
    np.testing.assert_allclose(pos[2], [10.0 + 2.0 * 32767 / 65535,
                                        20.0, 38.0], atol=1e-4)


def test_pnts_constant_rgba_materialized():
    """CONSTANT_RGBA becomes a per-point COLOR_RGBA column when no
    explicit color semantic is present."""
    from pasture_tpu.io.tiles3d.feature_table import \
        FeatureTableDataReference

    pos = np.asarray([[1, 2, 3], [4, 5, 6]], np.float32)
    data = _pnts_bytes({
        "POINTS_LENGTH": 2,
        "CONSTANT_RGBA": [255, 128, 0, 200],
        "POSITION": FeatureTableDataReference(0),
    }, pos.tobytes())
    r = PntsReader(data)
    buf = r.read_all()
    rgba = buf.get(att.COLOR_RGBA.name)
    assert rgba.shape == (2, 4)
    np.testing.assert_array_equal(rgba, [[255, 128, 0, 200]] * 2)
    np.testing.assert_allclose(buf.get(att.POSITION_3D.name), pos)


def test_pnts_oct16p_normals():
    """NORMAL_OCT16P octahedral decode (beyond the reference's TODO,
    pnts_writer.rs:113-117): encode exact unit vectors, read back."""
    from pasture_tpu.io.tiles3d.feature_table import \
        FeatureTableDataReference
    from pasture_tpu.io.tiles3d.pnts import oct16p_decode, oct16p_encode

    rng = np.random.default_rng(3)
    v = rng.normal(size=(64, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    # include the axis-aligned + lower-hemisphere corners explicitly
    v = np.concatenate([v, np.asarray(
        [[0, 0, 1], [0, 0, -1], [1, 0, 0], [-1, 0, 0], [0, 1, 0],
         [0, -1, 0]], np.float64)])
    enc = oct16p_encode(v)
    dec = oct16p_decode(enc)
    # 8-bit oct encoding: worst-case angular error well under 2 degrees
    cos = np.sum(dec * v, axis=1)
    assert np.all(cos > np.cos(np.deg2rad(2.0)))

    pos = np.zeros((len(v), 3), np.float32)
    body = pos.tobytes() + enc.tobytes()
    data = _pnts_bytes({
        "POINTS_LENGTH": len(v),
        "POSITION": FeatureTableDataReference(0),
        "NORMAL_OCT16P": FeatureTableDataReference(pos.nbytes),
    }, body)
    buf = PntsReader(data).read_all()
    np.testing.assert_allclose(buf.get(att.NORMAL.name), dec)


def test_pnts_rgb565_and_batch_id():
    """RGB565 unpack + BATCH_ID -> PointID column (reference TODOs both,
    pnts_writer.rs:113-117)."""
    from pasture_tpu.io.tiles3d.feature_table import \
        FeatureTableDataReference

    pos = np.zeros((3, 3), np.float32)
    # pure red / pure green / mid gray in 5-6-5 packing
    c = np.asarray([0x1F << 11, 0x3F << 5, (16 << 11) | (32 << 5) | 16],
                   np.uint16)
    ids = np.asarray([7, 7, 42], np.uint16)
    body = pos.tobytes() + c.tobytes() + ids.tobytes()
    data = _pnts_bytes({
        "POINTS_LENGTH": 3,
        "POSITION": FeatureTableDataReference(0),
        "RGB565": FeatureTableDataReference(pos.nbytes),
        "BATCH_ID": FeatureTableDataReference(
            pos.nbytes + c.nbytes, "UNSIGNED_SHORT"),
    }, body)
    buf = PntsReader(data).read_all()
    rgb = buf.get(att.COLOR_RGB.name)
    np.testing.assert_array_equal(rgb[0], [255, 0, 0])
    np.testing.assert_array_equal(rgb[1], [0, 255, 0])
    np.testing.assert_array_equal(
        rgb[2], np.round(np.asarray([16 * 255 / 31, 32 * 255 / 63,
                                     16 * 255 / 31])).astype(np.uint8))
    pid = buf.get(att.POINT_ID.name)
    assert pid.dtype == np.uint64
    np.testing.assert_array_equal(pid, [7, 7, 42])


def test_pnts_compact_writer_roundtrip(tmp_path):
    """Writer-side POSITION_QUANTIZED + NORMAL_OCT16P (opt-in compact
    wire forms; reference TODOs both, pnts_writer.rs:113-117)."""
    from pasture_tpu.buffers.host import HostPointBuffer
    from pasture_tpu.io.tiles3d.pnts import PntsWriter
    from pasture_tpu.layout import dtypes as dt
    from pasture_tpu.layout.schema import PointSchema

    rng = np.random.default_rng(11)
    pos = rng.uniform(-50.0, 50.0, (256, 3)).astype(np.float32)
    nrm = rng.normal(size=(256, 3))
    nrm = (nrm / np.linalg.norm(nrm, axis=1, keepdims=True)).astype(
        np.float32)
    schema = PointSchema.from_attributes(
        [att.POSITION_3D.with_dtype(dt.VEC3F32), att.NORMAL])
    buf = HostPointBuffer(
        schema, {att.POSITION_3D.name: pos, att.NORMAL.name: nrm},
        validate=False)
    path = tmp_path / "compact.pnts"
    # rtc_center composes with quantization: the quantized volume is
    # rtc-relative, the ABSOLUTE-mode reader re-adds the center
    with PntsWriter(path, schema, rtc_center=[100.0, 200.0, 300.0],
                    quantize_positions=True, compress_normals=True) as w:
        w.write(buf)
    back = PntsReader(path).read_all()
    # u16 quantization: error <= extent/65535 per axis (~1.6 mm here)
    extent = pos.max(axis=0) - pos.min(axis=0)
    err = np.abs(back.get(att.POSITION_3D.name) - pos)
    # quantization step + f32 rounding through the rtc add-back at ~300
    assert np.all(err <= extent[None, :] / 65535.0 + 1e-3)
    cos = np.sum(back.get(att.NORMAL.name) * nrm, axis=1)
    assert np.all(cos > np.cos(np.deg2rad(2.0)))


def test_pnts_quantized_writer_degenerate_and_nonfinite(tmp_path):
    """Advisor findings (round 2): a zero-extent axis must emit a sane
    QUANTIZED_VOLUME_SCALE (1.0, not a 1e-30 sentinel) for third-party
    decoders, and non-finite positions must raise instead of silently
    corrupting the uint16 cast."""
    import json
    import struct

    import pytest

    from pasture_tpu.buffers.host import HostPointBuffer
    from pasture_tpu.io.tiles3d.pnts import PntsWriter
    from pasture_tpu.layout import dtypes as dt
    from pasture_tpu.layout.schema import PointSchema

    schema = PointSchema.from_attributes(
        [att.POSITION_3D.with_dtype(dt.VEC3F32)])
    pos = np.array([[0.0, 5.0, -1.0], [10.0, 5.0, 3.0], [4.0, 5.0, 0.5]],
                   np.float32)  # y axis has zero extent
    buf = HostPointBuffer(schema, {att.POSITION_3D.name: pos},
                          validate=False)
    path = tmp_path / "flat.pnts"
    with PntsWriter(path, schema, quantize_positions=True) as w:
        w.write(buf)
    raw = path.read_bytes()
    ftj_len = struct.unpack_from("<I", raw, 12)[0]
    header = json.loads(raw[28:28 + ftj_len].decode())
    assert header["QUANTIZED_VOLUME_SCALE"][1] == 1.0
    back = PntsReader(path).read_all().get(att.POSITION_3D.name)
    np.testing.assert_allclose(back, pos, atol=1e-3)
    np.testing.assert_array_equal(back[:, 1], 5.0)

    bad = pos.copy()
    bad[1, 2] = np.nan
    bbuf = HostPointBuffer(schema, {att.POSITION_3D.name: bad},
                           validate=False)
    with PntsWriter(tmp_path / "bad.pnts", schema,
                    quantize_positions=True) as w:
        w.write(bbuf)
        with pytest.raises(ValueError, match="finite"):
            w.flush()


def test_pnts_writer_warns_on_dropped_point_id(tmp_path):
    """BATCH_ID is read-only (decoded into PointID); writing a schema
    with PointID warns that the column is dropped (advisor finding)."""
    import pytest

    from pasture_tpu.io.tiles3d.pnts import PntsWriter
    from pasture_tpu.layout import dtypes as dt
    from pasture_tpu.layout.schema import PointSchema

    schema = PointSchema.from_attributes(
        [att.POSITION_3D.with_dtype(dt.VEC3F32), att.POINT_ID])
    with pytest.warns(UserWarning, match="BATCH_ID"):
        PntsWriter(tmp_path / "drop.pnts", schema)

"""Layered-LAZ (formats 6-8) context-table risk tests.

The codec's 16x16 (number_of_returns, return_number) -> context tables
are a reconstruction of LASzip's (authoritative source:
``laszip/src/lasreaditemcompressed_v3.cpp`` arrays
``number_return_map_6ctx`` / ``number_return_level_8ctx``; inject the
real arrays via ``set_point14_tables`` if ever retrievable —
LIMITATIONS.md).  Round-2 verdict obligations covered here:

* **Sensitivity census**: perturb each table entry the laszip-produced
  fixtures *use* and assert the decode actually changes — entries whose
  perturbation is observable are genuinely VALIDATED against laszip
  output; the remainder is pinned to a documented best-effort list (the
  test fails if the validated/best-effort split drifts silently).
* **Full-coverage synthetic archive**: a multi-chunk format-6 file
  hitting every (nret, ret) byte pair, all scanner channels, and
  gps-time toggles round-trips bit-exactly, and EVERY one of the 256
  map entries is exercised (perturbing any of them breaks the decode) —
  so encoder/decoder context selection is self-consistent everywhere,
  including across chunk-boundary context resets.
"""

import io

import numpy as np
import pytest

from pasture_tpu.buffers.host import HostPointBuffer
from pasture_tpu.io.las import LasReader, LasWriter
from pasture_tpu.io.las.header import LasPointFormat
from pasture_tpu.io.las.layout import point_schema_from_las_format
from pasture_tpu.layout import attributes as att

laszip = __import__("pasture_tpu.native.laszip",
                    fromlist=["_native", "get_point14_tables",
                              "set_point14_tables"])

pytestmark = pytest.mark.skipif(laszip._native() is None,
                                reason="native laszip codec unavailable")


def _decode_columns(data: bytes):
    buf = LasReader(io.BytesIO(data),
                    point_schema_matches_memory_layout=True,
                    compressed=True).read_all()
    return {n: np.asarray(buf.get(n)) for n in buf.schema.names}


def _differs(a, b):
    return any((a[k] != b[k]).any() for k in a)


@pytest.fixture
def restore_tables():
    m0, l0 = laszip.get_point14_tables()
    yield m0, l0
    laszip.set_point14_tables(m0, l0)


def _perturbed(table: bytes, idx: int, modulus: int) -> bytes:
    t = bytearray(table)
    t[idx] = (t[idx] + 1) % modulus
    return bytes(t)


def test_fixture_table_sensitivity_census(reference_test_data,
                                          restore_tables):
    """Which map-table entries do the laszip-produced fixtures actually
    validate?  An entry is VALIDATED iff perturbing it changes the
    fixture decode (a fresh-model context swap can be a no-op, so mere
    occurrence of the (n, r) pair is NOT enough).  The validated set is
    pinned; silent shrinkage = lost coverage, growth = update the pin
    AND the LIMITATIONS.md caveat."""
    m0, l0 = restore_tables
    validated = set()
    exercised = set()
    for fmt in (6, 7, 8):
        raw = open(f"{reference_test_data}/10_points_format_{fmt}.laz",
                   "rb").read()
        base = _decode_columns(raw)
        conv = LasReader(io.BytesIO(raw), compressed=True).read_all()
        pairs = sorted(set(zip(
            np.asarray(conv.get(att.NUMBER_OF_RETURNS.name)).astype(int),
            np.asarray(conv.get(att.RETURN_NUMBER.name)).astype(int))))
        exercised.update(pairs)
        for n, r in pairs:
            laszip.set_point14_tables(
                _perturbed(m0, 16 * n + r, 6), l0)
            try:
                changed = _differs(base, _decode_columns(raw))
            except Exception:
                changed = True     # garbled stream is also "observable"
            finally:
                laszip.set_point14_tables(m0, l0)
            if changed:
                validated.add((n, r))

    # CENSUS RESULT (pinned): the 10-point fixtures occur only on the
    # (i, i) diagonal AND their decode is table-INVARIANT — even
    # collapsing the whole map to one context reproduces them (constant
    # ramp deltas never diverge the per-context models).  So the
    # laszip-produced fixtures validate the coding pipeline but ZERO
    # table entries; table confidence rests on the structural
    # reconstruction + the full-coverage self-consistency test below
    # (LIMITATIONS.md).  If richer fixtures ever make entries
    # observable, update the pin and the docs.
    assert exercised == {(i, i) for i in range(10)}
    assert validated == set(), (
        "fixtures became table-sensitive — update LIMITATIONS.md: "
        f"{sorted(validated)}")


def _full_coverage_buffer():
    """~2.5 chunks of points cycling EVERY (nret, ret) byte pair, all 4
    scanner channels, gps-time toggles, random-walk positions."""
    n = 128_000   # default chunk 50k -> 3 chunks, 2 boundary resets
    rng = np.random.default_rng(42)
    schema = point_schema_from_las_format(LasPointFormat(6))
    pairs = np.arange(256, dtype=np.uint8)
    seq = np.tile(pairs, n // 256)
    rng.shuffle(seq)
    gps = np.repeat(np.arange(n // 4, dtype=np.float64) * 0.001, 4)[:n]
    cols = {
        att.POSITION_3D.name: np.round(
            np.cumsum(rng.normal(0, 0.2, (n, 3)), axis=0), 3),
        att.INTENSITY.name: rng.integers(0, 65536, n).astype(np.uint16),
        att.RETURN_NUMBER.name: (seq & 0x0F).astype(np.uint8),
        att.NUMBER_OF_RETURNS.name: (seq >> 4).astype(np.uint8),
        att.CLASSIFICATION_FLAGS.name:
            rng.integers(0, 16, n).astype(np.uint8),
        att.SCANNER_CHANNEL.name: (np.arange(n) % 4).astype(np.uint8),
        att.SCAN_DIRECTION_FLAG.name:
            rng.integers(0, 2, n).astype(np.uint8),
        att.EDGE_OF_FLIGHT_LINE.name:
            rng.integers(0, 2, n).astype(np.uint8),
        att.CLASSIFICATION.name: rng.integers(0, 64, n).astype(np.uint8),
        att.USER_DATA.name: rng.integers(0, 256, n).astype(np.uint8),
        att.SCAN_ANGLE.name:
            rng.integers(-15000, 15000, n).astype(np.int16),
        att.POINT_SOURCE_ID.name:
            rng.integers(0, 100, n).astype(np.uint16),
        att.GPS_TIME.name: gps,
    }
    return HostPointBuffer.from_columns(schema, cols)


def test_synthetic_full_coverage_roundtrip_and_exercise(restore_tables):
    m0, l0 = restore_tables
    buf = _full_coverage_buffer()
    stream = io.BytesIO()
    w = LasWriter(stream, buf.schema, compressed=True)
    w.write(buf)
    w.flush()
    raw = stream.getvalue()

    # (1) bit-exact roundtrip across chunk-boundary context resets
    back = _decode_columns(raw)
    conv = LasReader(io.BytesIO(raw), compressed=True).read_all()
    for name in buf.schema.names:
        if name == att.POSITION_3D.name:
            # f64 -> i32 local truncation at write (Rust `as` parity): 1-unit bound
            np.testing.assert_allclose(
                np.asarray(conv.get(name)), np.asarray(buf.get(name)),
                atol=1.001e-3, err_msg=name)
        else:
            np.testing.assert_array_equal(
                np.asarray(conv.get(name)), np.asarray(buf.get(name)),
                err_msg=name)

    # (2) every map entry is LIVE on this archive: perturbing any one of
    # the 256 entries must break the decode (encoder wrote with the
    # unperturbed table), i.e. no dead rows anywhere in the table
    dead = []
    for idx in range(256):
        laszip.set_point14_tables(_perturbed(m0, idx, 6), l0)
        try:
            same = not _differs(back, _decode_columns(raw))
        except Exception:
            same = False
        finally:
            laszip.set_point14_tables(m0, l0)
        if same:
            dead.append((idx >> 4, idx & 15))
    assert not dead, f"map entries unexercised by full-coverage file: {dead}"

    # (3) same for the |n-r| level table (8 contexts)
    dead_lvl = []
    for idx in range(256):
        laszip.set_point14_tables(m0, _perturbed(l0, idx, 8))
        try:
            same = not _differs(back, _decode_columns(raw))
        except Exception:
            same = False
        finally:
            laszip.set_point14_tables(m0, l0)
        if same:
            dead_lvl.append((idx >> 4, idx & 15))
    assert not dead_lvl, \
        f"level entries unexercised by full-coverage file: {dead_lvl}"

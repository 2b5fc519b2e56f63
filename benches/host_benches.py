"""Host-side benchmark harness mirroring the reference's criterion benches
(SURVEY.md §6: iteration, layout conversion, AABB, filter, LAS/LAZ read +
write).  Prints one JSON object per metric.

Usage: python benches/host_benches.py [n_points]
"""

import io
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from pasture_tpu.buffers.host import HostPointBuffer  # noqa: E402
from pasture_tpu.io.las import LasReader, LasWriter  # noqa: E402
from pasture_tpu.io.las.header import LasPointFormat  # noqa: E402
from pasture_tpu.io.las.layout import point_schema_from_las_format  # noqa: E402
from pasture_tpu.layout import attributes as att  # noqa: E402
from pasture_tpu.layout import dtypes as dt  # noqa: E402
from pasture_tpu.layout.schema import PointSchema  # noqa: E402


def timed(fn, repeats=5):
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def report(name, n, seconds, unit="Mpoints/s"):
    print(json.dumps({"metric": name, "value": round(n / seconds / 1e6, 2),
                      "unit": unit}))


def make_buffer(n, fmt=1):
    rng = np.random.default_rng(0)
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
        att.POINT_SOURCE_ID.name: rng.integers(0, 16, n).astype(np.uint16),
        att.GPS_TIME.name: np.sort(rng.uniform(0, 1e5, n)),
    }
    return HostPointBuffer.from_columns(schema, cols)


def main(n=1_000_000):
    buf = make_buffer(n)

    # layout conversion (reference layout_conversion_bench)
    target = PointSchema.from_attributes([
        att.POSITION_3D.with_dtype(dt.VEC3F32),
        att.INTENSITY.with_dtype(dt.F32), att.CLASSIFICATION])
    report("layout_conversion", n,
           timed(lambda: buf.convert_schema(target)))

    # interleaved materialization + zero-copy ingest
    report("to_interleaved", n, timed(buf.to_interleaved))
    wire = buf.to_interleaved()
    report("from_interleaved_zero_copy", n, timed(
        lambda: HostPointBuffer.from_interleaved(buf.schema, wire,
                                                 copy=False)))

    # AABB + filter (reference aabb_bench / buffer_filter_bench)
    from pasture_tpu.algorithms import calculate_bounds
    report("aabb", n, timed(lambda: calculate_bounds(buf)))
    inten = buf.get(att.INTENSITY.name)
    report("filter", n, timed(lambda: buf.filter(inten > 1000)))

    # convex hull (reference convexhull_bench: 1k/10k/100k uniform cube)
    from pasture_tpu.algorithms import convex_hull_as_triangle_mesh
    rng = np.random.default_rng(1)
    schema3 = PointSchema.from_attributes([att.POSITION_3D])
    for hn in (1_000, 10_000, 100_000):
        hbuf = HostPointBuffer(
            schema3,
            {att.POSITION_3D.name: rng.uniform(-100.0, 100.0, (hn, 3))},
            validate=False)
        report(f"convex_hull_{hn}", hn,
               timed(lambda b=hbuf: convex_hull_as_triangle_mesh(b),
                     repeats=3))

    # record->column extraction: native threaded deinterleaver vs numpy
    # strided field walks (the host-ingest hot loop)
    try:
        from pasture_tpu.native.laszip import _native, deinterleave_records
        if _native() is not None:
            import io as _io
            _st = _io.BytesIO()
            _w = LasWriter(_st, buf.schema)
            _w.write(buf)
            _w.flush()
            _r = LasReader(_io.BytesIO(_st.getvalue()))
            _rec = _r._records[0:n]
            _members = _r._exact_schema.members
            _fields = [(m.offset, m.dtype.np_component_dtype, m.size)
                       for m in _members]
            report("deinterleave_native", n, timed(
                lambda: deinterleave_records(
                    _rec, n, _r._exact_schema.point_size, _fields)))
            report("deinterleave_numpy", n, timed(
                lambda: [np.ascontiguousarray(_rec[m.name])
                         for m in _members]))
    except Exception:
        pass

    # LAS write + read (reference las_bench)
    stream = io.BytesIO()
    def write_las():
        stream.seek(0)
        w = LasWriter(stream, buf.schema)
        w.write(buf)
        w.flush()
    report("las_write", n, timed(write_las))
    las_bytes = stream.getvalue()
    report("las_read", n, timed(
        lambda: LasReader(io.BytesIO(las_bytes)).read_all()))
    report("las_read_exact_schema", n, timed(
        lambda: LasReader(io.BytesIO(las_bytes),
                          point_schema_matches_memory_layout=True).read_all()))

    # LAZ codec (native)
    try:
        zstream = io.BytesIO()
        def write_laz():
            zstream.seek(0)
            zstream.truncate()
            w = LasWriter(zstream, buf.schema, compressed=True)
            w.write(buf)
            w.flush()
        report("laz_write", n, timed(write_laz, repeats=3))
        laz_bytes = zstream.getvalue()
        report("laz_read", n, timed(
            lambda: LasReader(io.BytesIO(laz_bytes),
                              compressed=True).read_all(), repeats=3))

        # LAZ codec thread-scaling sweep (chunk-parallel decompression;
        # small chunks so the file has >= 64 chunks even at 1M points).
        # NOTE: the sweep measures the MACHINE too — on a 2-core host
        # expect ~2x at best (report nproc alongside).
        import ctypes
        import os as _os
        zs2 = io.BytesIO()
        w2 = LasWriter(zs2, buf.schema, compressed=True,
                       laz_chunk_size=8192)
        w2.write(buf)
        w2.flush()
        r2 = LasReader(io.BytesIO(zs2.getvalue()), compressed=True)
        laz2, h2 = r2._laz, r2.header
        for nt in (1, 2, 4, 8):
            out = ctypes.create_string_buffer(
                h2.point_count * h2.point_record_length)
            def dec(nt=nt, out=out):
                rc = laz2._lib.laz_decompress(
                    laz2._data, len(laz2._data), h2.offset_to_point_data,
                    h2.point_count, h2.point_record_length,
                    laz2.vlr.chunk_size, laz2._items, laz2._nitems, 0,
                    h2.point_count, out, nt)
                assert rc == 0
            report(f"laz_decode_threads_{nt}_of_{_os.cpu_count()}cores",
                   n, timed(dec, repeats=3))
    except NotImplementedError:
        pass


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000)

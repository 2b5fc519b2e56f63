"""END-TO-END system bench: real file on disk -> exact voxel map on chip.

The device headline (bench.py) measures the chip fed from HBM; this bench
measures the SYSTEM: a Morton-ordered survey-scale LAS (and LAZ) file is
streamed through ``stream_batches`` (host read-ahead thread), each chunk
runs the EXACT device voxel path (tiled sorts — arbitrary tile/chunk
splits are repaired exactly by the weighted merge), and an on-device
accumulator folds the partials (``streaming_voxel_downsample``).  The
reported rate INCLUDES ingest — the honest number a production pipeline
gets (round-3 verdict task 2; reference ethos fast_las_parsing.rs:28-47).

The input is cached under ``--workdir`` (default /tmp/pasture_e2e): a
realistic 200 pts/m² survey over ~400x400 m, Morton-ordered as survey
archives commonly are (and as one ``morton_sort`` pass produces); the
z-order is what makes chunks spatially coherent so per-chunk device
sorts stay cheap — correctness never depends on it.

Prints one JSON line per row:
    {"metric": "e2e_las_to_map", "value": <Mpts/s incl ingest>, ...}
    {"metric": "e2e_laz_to_map", ...}

Run:  timeout 5400 /opt/venv/bin/python benches/end_to_end_bench.py
      [--points 33554432] [--leaf 0.5] [--skip-laz]
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _morton_u64(cell: np.ndarray) -> np.ndarray:
    def expand(v):
        v = v.astype(np.uint64) & np.uint64(0xFFFFF)
        v = (v | (v << np.uint64(32))) & np.uint64(0xFFFF00000000FFFF)
        v = (v | (v << np.uint64(16))) & np.uint64(0x00FF0000FF0000FF)
        v = (v | (v << np.uint64(8))) & np.uint64(0xF00F00F00F00F00F)
        v = (v | (v << np.uint64(4))) & np.uint64(0x30C30C30C30C30C3)
        v = (v | (v << np.uint64(2))) & np.uint64(0x9249249249249249)
        return v
    return (expand(cell[:, 0]) | (expand(cell[:, 1]) << np.uint64(1))
            | (expand(cell[:, 2]) << np.uint64(2)))


def make_file(path: Path, n: int) -> None:
    """Morton-ordered survey cloud: ~400x400 m, 200 pts/m², gentle
    terrain + per-point noise, intensity + classification attributes."""
    from pasture_tpu.buffers.host import HostPointBuffer
    from pasture_tpu.io import write_all
    from pasture_tpu.layout import attributes as att
    from pasture_tpu.layout.schema import PointSchema

    rng = np.random.default_rng(11)
    side = float(np.sqrt(n / 200.0))
    xy = rng.uniform(0, side, (n, 2))
    z = (4.0 * np.sin(xy[:, 0] * 0.02) + 3.0 * np.cos(xy[:, 1] * 0.017)
         + rng.normal(0, 0.05, n) + 50.0)
    pos = np.stack([xy[:, 0], xy[:, 1], z], axis=1)
    pmin = pos.min(0)
    ext = (pos.max(0) - pmin).max()
    cell = np.clip((pos - pmin) / ext * (1 << 20), 0,
                   (1 << 20) - 1).astype(np.uint64)
    order = np.argsort(_morton_u64(cell), kind="stable")
    pos = pos[order]
    inten = rng.integers(0, 4096, n).astype(np.uint16)
    cls = ((cell[order, 0] >> np.uint64(13)) % np.uint64(7)).astype(np.uint8)
    schema = PointSchema.from_attributes(
        [att.POSITION_3D, att.INTENSITY, att.CLASSIFICATION])
    buf = HostPointBuffer.from_columns(schema, {
        att.POSITION_3D.name: pos, att.INTENSITY.name: inten,
        att.CLASSIFICATION.name: cls})
    t0 = time.perf_counter()
    write_all(buf, path)
    print(f"# wrote {path.name}: {n} pts in {time.perf_counter()-t0:.0f}s",
          file=sys.stderr, flush=True)


def host_read_row(path: Path, n: int, chunk: int, label: str) -> None:
    """Host-only converting read of the same file/schema — attributes the
    end-to-end wall between host parsing and the device side (on a
    TUNNELED dev chip the host->device upload at ~25-40 MB/s dominates;
    production hosts feed chips over PCIe at GB/s)."""
    from pasture_tpu.io import open_reader
    from pasture_tpu.layout import attributes as att
    from pasture_tpu.layout.schema import PointSchema

    schema = PointSchema.from_attributes(
        [att.POSITION_3D, att.INTENSITY, att.CLASSIFICATION])
    t0 = time.perf_counter()
    seen = 0
    with open_reader(path) as r:
        while True:
            buf = r.read(chunk, schema=schema)
            if not len(buf):
                break
            seen += len(buf)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": f"e2e_{label}_host_read_only",
        "value": round(seen / dt / 1e6, 2),
        "unit": "Mpoints/s", "seconds": round(dt, 2), "points": seen,
    }), flush=True)


def run_row(path: Path, n: int, leaf: float, chunk: int, label: str,
            repeats: int = 2) -> None:
    from pasture_tpu.io.streaming import streaming_voxel_downsample

    best = float("inf")
    nv = 0
    for _ in range(repeats):
        t0 = time.perf_counter()
        from pasture_tpu.layout import attributes as att
        from pasture_tpu.layout.schema import PointSchema
        schema = PointSchema.from_attributes(
            [att.POSITION_3D, att.INTENSITY, att.CLASSIFICATION])
        out = streaming_voxel_downsample(
            path, leaf, chunk_points=chunk, grid_bits=10,
            use_metadata_bounds=True, sort_tiles=chunk // 512,
            schema=schema)
        nv = int(out.count)          # device fetch closes the pipeline
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({
        "metric": f"e2e_{label}_to_map",
        "value": round(n / best / 1e6, 2),
        "unit": "Mpoints/s incl ingest",
        "seconds": round(best, 2), "points": n, "voxels": nv,
        "leaf": leaf, "chunk": chunk,
    }), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=1 << 25)
    ap.add_argument("--leaf", type=float, default=0.5)
    ap.add_argument("--chunk", type=int, default=1 << 20)
    ap.add_argument("--workdir", default="/tmp/pasture_e2e")
    ap.add_argument("--skip-laz", action="store_true")
    args = ap.parse_args()

    wd = Path(args.workdir)
    wd.mkdir(parents=True, exist_ok=True)
    las = wd / f"e2e_{args.points}.las"
    laz = wd / f"e2e_{args.points}.laz"
    if not las.exists():
        make_file(las, args.points)
    if not args.skip_laz and not laz.exists():
        from pasture_tpu.io import open_reader, write_all
        with open_reader(las) as r:
            buf = r.read_all()
        t0 = time.perf_counter()
        write_all(buf, laz)
        print(f"# wrote {laz.name} in {time.perf_counter()-t0:.0f}s",
              file=sys.stderr, flush=True)

    host_read_row(las, args.points, args.chunk, "las")
    run_row(las, args.points, args.leaf, args.chunk, "las")
    if not args.skip_laz:
        host_read_row(laz, args.points, args.chunk, "laz")
        run_row(laz, args.points, args.leaf, args.chunk, "laz")


if __name__ == "__main__":
    main()

"""Scaling benchmark: sharded transform+voxelize throughput vs mesh size.

Reports points/s at 1, 2, 4, ... devices and the parallel efficiency
relative to 1 device (the north-star "scaling efficiency at 1 chip /
1 host / N hosts" measurement).  On a virtual CPU mesh the ABSOLUTE
numbers are meaningless (tiny shapes, host emulation) — only the
efficiency column and the fact that the sharded program compiles and
runs are informative; run on a real multi-chip slice for real numbers.

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python benches/scaling_bench.py
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")

import jax  # noqa: E402

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    # env alone is too late here: a sitecustomize hook may have registered
    # a TPU plugin already — force the platform before any computation
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from pasture_tpu.buffers.device import PointBatch  # noqa: E402
from pasture_tpu.layout import attributes as att  # noqa: E402
from pasture_tpu.layout.schema import PointSchema  # noqa: E402
from pasture_tpu.parallel import make_mesh, shard_batch, \
    sharded_voxel_downsample  # noqa: E402

N_PER_DEVICE = 1 << 14


def run(n_devices: int, repeats: int = 3) -> float:
    mesh = make_mesh(n_devices)
    n = N_PER_DEVICE * n_devices
    rng = np.random.default_rng(0)
    schema = PointSchema.from_attributes([att.POSITION_3D, att.INTENSITY])
    data = {
        att.POSITION_3D.name: jnp.asarray(
            rng.uniform(0, 100, (n, 3)).astype(np.float32)),
        att.INTENSITY.name: jnp.asarray(
            rng.integers(0, 65536, n, dtype=np.uint16)),
    }
    batch = shard_batch(
        PointBatch(data, jnp.asarray(n, jnp.int32), schema, {}), mesh)

    out, counts = sharded_voxel_downsample(batch, mesh, 0.5)  # compile
    total = int(np.asarray(out.count))
    assert total > 0

    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out, counts = sharded_voxel_downsample(batch, mesh, 0.5)
        int(np.asarray(out.count))  # forces completion (host fetch)
        best = min(best, time.perf_counter() - t0)
    return n / best


def sweep():
    max_dev = len(jax.devices())
    sizes = [d for d in (1, 2, 4, 8) if d <= max_dev]
    rows, base = [], None
    for d in sizes:
        pps = run(d)
        if base is None:
            base = pps
        eff = pps / (base * d)
        rows.append((d, pps, eff))
        print(json.dumps({
            "metric": "sharded_voxelize_throughput",
            "devices": d,
            "value": round(pps / 1e6, 3),
            "unit": "Mpoints/s",
            "efficiency_vs_1dev": round(eff, 3),
        }), flush=True)
    return rows


def _multihost_worker(coord: str, nproc: int, idx: int) -> None:
    """One process of the multihost variant: join the jax.distributed
    coordinator, build the GLOBAL mesh, time sharded voxelize on it."""
    jax.config.update("jax_platforms", "cpu")
    from pasture_tpu.parallel import (global_mesh, initialize_multihost,
                                      shard_batch,
                                      sharded_voxel_downsample)
    initialize_multihost(coordinator_address=coord, num_processes=nproc,
                         process_id=idx)
    mesh = global_mesh(("points",))
    ndev = len(jax.devices())
    n = N_PER_DEVICE * ndev
    rng = np.random.default_rng(0)
    schema = PointSchema.from_attributes([att.POSITION_3D, att.INTENSITY])
    data = {
        att.POSITION_3D.name: jnp.asarray(
            rng.uniform(0, 100, (n, 3)).astype(np.float32)),
        att.INTENSITY.name: jnp.asarray(
            rng.integers(0, 65536, n, dtype=np.uint16)),
    }
    batch = shard_batch(
        PointBatch(data, jnp.asarray(n, jnp.int32), schema, {}), mesh)
    out, _ = sharded_voxel_downsample(batch, mesh, 0.5)
    int(np.asarray(out.count))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out, _ = sharded_voxel_downsample(batch, mesh, 0.5)
        int(np.asarray(out.count))
        best = min(best, time.perf_counter() - t0)
    if idx == 0:
        print(json.dumps({
            "metric": "multihost_sharded_voxelize_throughput",
            "processes": nproc, "devices": ndev,
            "value": round(n / best / 1e6, 3), "unit": "Mpoints/s",
        }), flush=True)


def run_multihost(nproc: int = 2) -> float:
    """Spawn ``nproc`` worker processes (jax.distributed over localhost,
    4 virtual devices each) and return aggregate points/s — the same
    entry points (initialize_multihost/global_mesh) run unchanged on a
    real multi-host TPU slice."""
    import socket
    import subprocess

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker",
         f"localhost:{port}", str(nproc), str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for i in range(nproc)]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            raise RuntimeError(f"multihost worker {i} failed:\n{out}")
    for out in outs:
        for ln in out.splitlines():
            if ln.startswith("{"):
                print(ln, flush=True)
                return json.loads(ln)["value"] * 1e6
    raise RuntimeError("no multihost result line:\n" + "\n".join(outs))


def emit_report(path: str = "SCALING.md") -> None:
    """One-command BASELINE.md-format scaling report.  Virtual-mesh rows
    measure SHARDING STRUCTURE only (tiny shapes, CPU emulation) — the
    absolute chip number comes from bench.py on the real TPU
    (BENCH_r*.json); on a real multi-chip slice this same command fills
    every row with real numbers."""
    rows = sweep()
    mh_pps = run_multihost(2)
    base = rows[0][1]
    md = ["# Scaling report (BASELINE.md format)", "",
          "Generated by `python benches/scaling_bench.py --report`.", "",
          "| configuration | points/s | efficiency vs linear | basis |",
          "|---|---|---|---|"]
    for d, pps, eff in rows:
        label = "1 chip" if d == 1 else f"1 host × {d} devices"
        md.append(f"| {label} | {pps/1e6:.3f} M | {eff:.1%} | "
                  f"virtual CPU mesh — structure-only |")
    mh_eff = mh_pps / (base * 8)
    md.append(f"| 2 hosts × 4 devices (jax.distributed) | "
              f"{mh_pps/1e6:.3f} M | {mh_eff:.1%} | "
              f"virtual CPU mesh — structure-only |")
    md += ["",
           "Real single-chip throughput: see the driver-run headline "
           "(`bench.py`, BENCH_r*.json — >1 Gpt/s/chip EXACT path). "
           "Virtual rows validate that the sharded program compiles, "
           "runs, and scales structurally; absolute virtual numbers are "
           "meaningless (BASELINE.md's ≥80%-at-2-hosts target is to be "
           "measured on a real slice with THIS command)."]
    with open(path, "w") as f:
        f.write("\n".join(md) + "\n")
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    if "--worker" in sys.argv:
        i = sys.argv.index("--worker")
        _multihost_worker(sys.argv[i + 1], int(sys.argv[i + 2]),
                          int(sys.argv[i + 3]))
    elif "--report" in sys.argv:
        emit_report()
    elif "--multihost" in sys.argv:
        run_multihost(2)
    else:
        sweep()

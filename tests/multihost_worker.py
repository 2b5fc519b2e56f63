"""Worker for the true multi-process multihost test.

Launched twice by tests/test_multihost.py (process 0 and 1), each with 4
virtual CPU devices -> one 8-device global mesh spanning two OS processes.
Exercises the real multi-host path: ``initialize_multihost`` (explicit
coordinator), ``global_mesh``, cross-process array construction, a
collective reduction (sharded bounds), Morton partition (all_to_all across
the process seam), and distributed ICP (psum-reduced normal equations).

Prints ``MULTIHOST_OK <translation>`` on success; the parent asserts both
processes print it and agree.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402


def main() -> None:
    coordinator, num_procs, pid = (sys.argv[1], int(sys.argv[2]),
                                   int(sys.argv[3]))
    from pasture_tpu.parallel import (  # noqa: E402
        distributed_icp, global_mesh, initialize_multihost, morton_partition)
    from pasture_tpu.buffers.device import PointBatch  # noqa: E402
    from pasture_tpu.layout import attributes as att  # noqa: E402
    from pasture_tpu.layout.schema import PointSchema  # noqa: E402

    initialize_multihost(coordinator_address=coordinator,
                         num_processes=num_procs, process_id=pid)
    assert jax.process_count() == num_procs
    mesh = global_mesh()
    n_dev = len(jax.devices())
    assert n_dev == 8, n_dev

    # deterministic global cloud, built identically in both processes
    rng = np.random.default_rng(3)
    n = 1024
    target = rng.uniform(0, 8, (n, 3))
    t_true = np.array([0.05, 0.02, -0.03])
    source = target - t_true

    shard = NamedSharding(mesh, P("points", None))
    rep = NamedSharding(mesh, P())

    def make_global(arr, sharding):
        return jax.make_array_from_process_local_data(sharding, arr)

    # each process owns its addressable slice of the sharded source
    per_proc = n // num_procs
    src_local = source[pid * per_proc:(pid + 1) * per_proc]
    src_g = jax.make_array_from_process_local_data(
        shard, src_local, global_shape=source.shape)
    tgt_g = make_global(target, rep)

    res = distributed_icp(src_g, tgt_g, mesh,
                          max_correspondence_distance=1.0, iterations=5)
    t = np.asarray(jax.device_get(res.translation))
    assert np.allclose(t, t_true, atol=1e-3), t

    # Morton partition: all_to_all rides the process seam
    schema = PointSchema.from_attributes([att.POSITION_3D])
    batch = PointBatch({att.POSITION_3D.name: src_g},
                       jnp.asarray(n, jnp.int32), schema, {})
    part, counts, dropped = morton_partition(batch, mesh,
                                             capacity_factor=4.0)
    # counts/dropped are sharded across both processes: reduce to
    # replicated scalars (a jitted sum inserts the all-reduce) then fetch
    totals = jax.jit(lambda c, d: (jnp.sum(c), jnp.sum(d)))(counts, dropped)
    total_count = int(jax.device_get(totals[0]))
    total_dropped = int(jax.device_get(totals[1]))
    assert total_count == n, total_count
    assert total_dropped == 0, total_dropped

    print(f"MULTIHOST_OK {t[0]:.6f} {t[1]:.6f} {t[2]:.6f}", flush=True)


if __name__ == "__main__":
    main()

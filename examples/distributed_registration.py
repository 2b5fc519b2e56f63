"""Distributed pipeline: sharded ingest -> Morton partition -> voxelize ->
ICP -> pose graph, over a device mesh.

Run on CPU with a virtual mesh:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/distributed_registration.py
"""

import jax
import jax.numpy as jnp
import numpy as np

from pasture_tpu.buffers.device import PointBatch
from pasture_tpu.buffers.host import HostPointBuffer
from pasture_tpu.layout import attributes as att
from pasture_tpu.layout.schema import PointSchema
from pasture_tpu.parallel import (
    distributed_icp,
    distributed_icp_partitioned,
    distributed_normals,
    make_mesh,
    morton_partition,
    shard_batch,
    sharded_bounds,
    sharded_voxel_downsample,
)


def main():
    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    print(f"mesh: {n_dev} devices over ('points',)")

    rng = np.random.default_rng(0)
    n = 4096 * n_dev
    pos = rng.uniform(0, 50, (n, 3))
    schema = PointSchema.from_attributes([att.POSITION_3D])
    host = HostPointBuffer.from_columns(schema, {att.POSITION_3D.name: pos})
    batch = shard_batch(PointBatch.from_host(host, capacity=n), mesh)

    mn, mx = sharded_bounds(batch, mesh)
    print("global bounds:", np.asarray(mn), np.asarray(mx))

    part, counts, dropped = morton_partition(batch, mesh)
    assert int(np.asarray(dropped).sum()) == 0, "raise capacity_factor"
    print("points per device after Morton partition:", np.asarray(counts))

    vox, vcounts = sharded_voxel_downsample(part, mesh, 1.0,
                                            per_shard_counts=counts)
    print("voxels per device:", np.asarray(vcounts),
          "total:", int(np.asarray(vox.count)))

    # EXACT global merge (round 4): per-shard partials carry counts +
    # unrounded means, and the weighted merge reproduces the one-shot
    # single-device voxelization at value level (add mode_runs=True to
    # also carry full per-(voxel, value) histograms, making the mode
    # policy's merge exact as well)
    from pasture_tpu.parallel import sharded_voxel_downsample_merged
    merged, aux = sharded_voxel_downsample_merged(
        part, mesh, 1.0, per_shard_counts=counts)
    print("globally merged voxels:", int(np.asarray(merged.count)),
          "(points accounted:", int(np.asarray(aux["counts"]).sum()), ")")

    # scan-to-map ICP, replicated map: same cloud shifted
    target = jnp.asarray(pos, jnp.float32)
    source = target - jnp.asarray([0.4, -0.2, 0.1], jnp.float32)
    result = distributed_icp(source, target, mesh,
                             max_correspondence_distance=2.0, iterations=10)
    print("recovered translation:", np.round(np.asarray(result.translation), 4),
          "rmse:", float(result.rmse))

    # scan-to-map ICP with the map PARTITIONED (never replicated): the
    # scan co-partitions with the map's Morton splitters and matches
    # against local block + ring-neighbour halo rows
    src_host = HostPointBuffer.from_columns(
        schema, {att.POSITION_3D.name: np.asarray(source)})
    src_batch = shard_batch(PointBatch.from_host(src_host, capacity=n), mesh)
    result_p, dropped_p = distributed_icp_partitioned(
        src_batch, batch, mesh, halo=256, capacity_factor=4.0,
        max_correspondence_distance=2.0, iterations=10)
    assert int(dropped_p) == 0
    print("partitioned-map translation:",
          np.round(np.asarray(result_p.translation), 4))

    # halo-windowed normals over the partitioned cloud
    part2, normals, curvature, ncounts, ndropped = distributed_normals(
        batch, mesh, k=10, window=32, capacity_factor=4.0)
    assert int(np.asarray(ndropped).sum()) == 0
    print("normals computed per device:", np.asarray(ncounts))


if __name__ == "__main__":
    main()

"""Halo exchange tests on the 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pasture_tpu.buffers.device import PointBatch
from pasture_tpu.buffers.host import HostPointBuffer
from pasture_tpu.layout import attributes as att
from pasture_tpu.layout.dtypes import DevicePolicy
from pasture_tpu.layout.schema import PointSchema
from pasture_tpu.parallel import halo_exchange, make_mesh, morton_partition, \
    shard_batch

N_DEV = 8


def test_halo_exchange_ships_boundary_rows(rng):
    mesh = make_mesh(N_DEV)
    n = 800
    schema = PointSchema.from_attributes([att.POSITION_3D])
    pos = rng.uniform(0, 10, (n, 3))
    host = HostPointBuffer.from_columns(schema, {att.POSITION_3D.name: pos})
    batch = PointBatch.from_host(host, policy=DevicePolicy.EXACT,
                                 capacity=1024)
    sharded = shard_batch(batch, mesh)
    part, counts, dropped = morton_partition(sharded, mesh, capacity_factor=4.0)
    counts = np.asarray(counts)
    assert np.asarray(dropped).sum() == 0

    halo = 16
    halo_cols, halo_counts = halo_exchange(part, jnp.asarray(counts), mesh,
                                           halo)
    hc = np.asarray(halo_counts)          # (8, 2)
    hp = np.asarray(halo_cols[att.POSITION_3D.name])  # (8*2*halo, 3)

    part_host = part.to_host(trim=False)
    ppos = part_host.get(att.POSITION_3D.name)
    per = part.capacity // N_DEV

    for d in range(N_DEV):
        left = (d - 1) % N_DEV
        right = (d + 1) % N_DEV
        # left halo = tail of left neighbour's valid prefix
        ln = min(counts[left], halo)
        assert hc[d, 0] == ln
        left_halo = hp[d * 2 * halo: d * 2 * halo + ln]
        expect = ppos[left * per + counts[left] - ln: left * per + counts[left]]
        np.testing.assert_allclose(np.sort(left_halo, axis=0),
                                   np.sort(expect, axis=0), atol=1e-12)
        # right halo = head of right neighbour's valid prefix
        rn = min(counts[right], halo)
        assert hc[d, 1] == rn
        right_halo = hp[d * 2 * halo + halo: d * 2 * halo + halo + rn]
        expect_r = ppos[right * per: right * per + rn]
        np.testing.assert_allclose(right_halo, expect_r, atol=1e-12)

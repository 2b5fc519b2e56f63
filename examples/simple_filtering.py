"""Predicate filtering, host-side and on device.

Counterpart of the reference's simple_filtering example
(pasture-io/examples/simple_filtering.rs) and the filter benchmark
dimension (pasture-core/benches/buffer_filter_bench.rs): keep only points
matching a predicate — here, classification == building — on the host
buffer, then the same as a jitted, gather/scatter-free device compaction.
"""

import jax
import numpy as np

from pasture_tpu.buffers.device import PointBatch
from pasture_tpu.buffers.host import HostPointBuffer
from pasture_tpu.layout import attributes as att
from pasture_tpu.layout.schema import PointSchema
from pasture_tpu.ops import filter_batch

BUILDING = 6  # ASPRS classification code


def main():
    rng = np.random.default_rng(11)
    n = 10_000
    schema = PointSchema.from_attributes(
        [att.POSITION_3D, att.CLASSIFICATION])
    buffer = HostPointBuffer.from_columns(schema, {
        att.POSITION_3D.name: rng.uniform(-100, 100, (n, 3)),
        att.CLASSIFICATION.name: rng.integers(0, 20, n).astype(np.uint8),
    })

    # host: boolean-mask filter (order-preserving, like HashMapBuffer::filter)
    cls = buffer.get(att.CLASSIFICATION)
    buildings = buffer.filter(cls == BUILDING)
    print(f"host filter:   {len(buffer)} -> {len(buildings)} building points")

    # device: jitted prefix compaction (one unique-key sort, no scatter)
    batch = PointBatch.from_host(buffer)
    kept = jax.jit(filter_batch, static_argnums=1)(
        batch, lambda d: d[att.CLASSIFICATION.name] == BUILDING)
    print(f"device filter: count = {int(kept.count)} "
          f"(capacity stays {kept.capacity})")
    out = kept.to_host()
    assert len(out) == len(buildings)
    assert np.array_equal(out.get(att.CLASSIFICATION),
                          buildings.get(att.CLASSIFICATION))
    print("host and device filters agree")


if __name__ == "__main__":
    main()

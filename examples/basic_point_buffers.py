"""Basic buffers: schemas, host SoA buffers, device batches.

Counterpart of the reference's basic_point_buffers / point_layout examples
(pasture-core/examples/): define a schema, build a host buffer from
columns, move it to the device, run a jitted op, bring it back.
"""

import jax
import numpy as np

from pasture_tpu.buffers.device import PointBatch
from pasture_tpu.buffers.host import HostPointBuffer
from pasture_tpu.layout import attributes as att
from pasture_tpu.layout.schema import PointSchema
from pasture_tpu.ops import batch_bounds


def main():
    schema = PointSchema.from_attributes(
        [att.POSITION_3D, att.INTENSITY, att.CLASSIFICATION])
    print("schema:", schema)
    print("wire record size:", schema.point_size, "bytes")

    rng = np.random.default_rng(0)
    n = 1000
    buffer = HostPointBuffer.from_columns(schema, {
        att.POSITION_3D.name: rng.uniform(-10, 10, (n, 3)),
        att.INTENSITY.name: rng.integers(0, 65536, n).astype(np.uint16),
        att.CLASSIFICATION.name: rng.integers(0, 32, n).astype(np.uint8),
    })
    print("host buffer:", buffer)

    # exact interleaved wire bytes (what a LAS record block looks like)
    wire = buffer.to_interleaved()
    print("wire bytes:", wire.nbytes)

    # to device, jitted bounds, back
    batch = PointBatch.from_host(buffer)
    mn, mx = jax.jit(
        lambda b: batch_bounds(b.get(att.POSITION_3D.name), b.valid_mask())
    )(batch)
    print("device bounds:", np.asarray(mn), np.asarray(mx))


if __name__ == "__main__":
    main()

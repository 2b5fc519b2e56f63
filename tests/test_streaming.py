"""Out-of-core streaming pipeline tests."""

import io

import numpy as np

from pasture_tpu.io import (
    stream_batches,
    streaming_bounds,
    streaming_voxel_downsample,
    write_all,
)
from pasture_tpu.buffers.host import HostPointBuffer
from pasture_tpu.layout import attributes as att
from pasture_tpu.layout.schema import PointSchema


def _write_big_las(path, rng, n=30_000):
    schema = PointSchema.from_attributes([att.POSITION_3D, att.INTENSITY])
    cols = {
        att.POSITION_3D.name: np.round(rng.uniform(0, 20, (n, 3)), 3),
        att.INTENSITY.name: rng.integers(0, 1000, n).astype(np.uint16),
    }
    buf = HostPointBuffer.from_columns(schema, cols)
    write_all(buf, path)
    return buf


def test_stream_batches_covers_file(tmp_path, rng):
    path = tmp_path / "big.las"
    buf = _write_big_las(path, rng)
    seen = 0
    for batch in stream_batches(path, chunk_points=8192):
        n = int(np.asarray(batch.count))
        assert batch.capacity == 8192
        seen += n
    assert seen == len(buf)


def test_streaming_bounds_matches_full_read(tmp_path, rng):
    path = tmp_path / "big.las"
    buf = _write_big_las(path, rng)
    bb = streaming_bounds(path, chunk_points=7000)
    pos = buf.get(att.POSITION_3D.name)
    np.testing.assert_allclose(bb.min, pos.min(axis=0), atol=1e-5)
    np.testing.assert_allclose(bb.max, pos.max(axis=0), atol=1e-5)


def test_streaming_voxel_downsample_matches_one_shot_values(tmp_path, rng):
    """The streamed two-stage merge must reproduce the one-shot global
    voxelization at VALUE level (not just the voxel count): positions
    (mean) to f32-summation tolerance, intensity (mean-cast-to-int)
    within one unit of the integer cast, classification (mode) exactly
    on spatially-coherent classes, GPS time (max) exactly."""
    n = 20_000
    schema = PointSchema.from_attributes(
        [att.POSITION_3D, att.INTENSITY, att.CLASSIFICATION, att.GPS_TIME])
    pos = np.round(rng.uniform(0, 20, (n, 3)), 3)
    # classes are spatially coherent (a function of position), the
    # realistic case where the weighted mode vote is exact
    cls = (np.floor(pos[:, 0]) % 7).astype(np.uint8)
    cols = {
        att.POSITION_3D.name: pos,
        att.INTENSITY.name: rng.integers(0, 1000, n).astype(np.uint16),
        att.CLASSIFICATION.name: cls,
        att.GPS_TIME.name: rng.uniform(0, 1e5, n),
    }
    buf = HostPointBuffer.from_columns(schema, cols)
    path = tmp_path / "big.las"
    write_all(buf, path)

    out = streaming_voxel_downsample(path, 1.0, chunk_points=4096)

    from pasture_tpu.buffers.device import PointBatch
    from pasture_tpu.io import read_all
    from pasture_tpu.ops.voxel import voxel_downsample
    import jax.numpy as jnp
    # one-shot reference on the READ-BACK data (LAS i32 encoding truncates
    # positions by up to one scale unit — Rust-`as` parity)
    rbuf = read_all(path)
    full = voxel_downsample(
        PointBatch.from_host(rbuf), 1.0,
        bounds=(jnp.asarray(rbuf.get_converted(att.POSITION_3D).min(0),
                            jnp.float32), None),
        semantics="floor")
    nv = int(np.asarray(full.count))
    assert int(np.asarray(out.count)) == nv
    # both paths order voxels by cell key: rows align
    np.testing.assert_allclose(
        np.asarray(out.data[att.POSITION_3D.name])[:nv],
        np.asarray(full.data[att.POSITION_3D.name])[:nv], atol=1e-5)
    di = (np.asarray(out.data[att.INTENSITY.name])[:nv].astype(np.int64)
          - np.asarray(full.data[att.INTENSITY.name])[:nv].astype(np.int64))
    assert np.abs(di).max() <= 1
    np.testing.assert_array_equal(
        np.asarray(out.data[att.CLASSIFICATION.name])[:nv],
        np.asarray(full.data[att.CLASSIFICATION.name])[:nv])
    np.testing.assert_allclose(
        np.asarray(out.data[att.GPS_TIME.name])[:nv],
        np.asarray(full.data[att.GPS_TIME.name])[:nv], rtol=1e-6)


def test_streaming_voxel_downsample_forwards_fast_path_kwargs(tmp_path):
    """Fast-path kwargs reach voxel_downsample through the wrapper."""
    import numpy as np

    from pasture_tpu.buffers.host import HostPointBuffer
    from pasture_tpu.io import write_all
    from pasture_tpu.io.streaming import streaming_voxel_downsample
    from pasture_tpu.layout import attributes as att
    from pasture_tpu.layout.schema import PointSchema

    rng = np.random.default_rng(0)
    n = 4096
    schema = PointSchema.from_attributes([att.POSITION_3D, att.INTENSITY])
    buf = HostPointBuffer.from_columns(schema, {
        att.POSITION_3D.name: rng.uniform(0, 20, (n, 3)),
        att.INTENSITY.name: rng.integers(0, 65536, n).astype(np.uint16)})
    path = tmp_path / "pts.las"
    write_all(buf, path)
    exact = streaming_voxel_downsample(path, 1.0, chunk_points=1024,
                                       grid_bits=10)
    quant = streaming_voxel_downsample(path, 1.0, chunk_points=1024,
                                       grid_bits=10,
                                       position_quantization_bits=10)
    assert len(exact.to_host()) == len(quant.to_host())
    np.testing.assert_allclose(
        quant.to_host().get(att.POSITION_3D),
        exact.to_host().get(att.POSITION_3D), atol=1.0 / 1024 + 1e-5)


def test_streaming_exact_mode_runs(tmp_path, rng):
    """``mode_runs=True`` carries full per-(voxel, value) histograms
    through the streaming fold, so classification matches the one-shot
    mode EXACTLY even on worst-case uniform-random labels (where the
    default top-2 vote only has a small documented envelope)."""
    n = 20_000
    schema = PointSchema.from_attributes(
        [att.POSITION_3D, att.CLASSIFICATION])
    pos = np.round(rng.uniform(0, 20, (n, 3)), 3)
    cols = {
        att.POSITION_3D.name: pos,
        att.CLASSIFICATION.name: rng.integers(0, 8, n).astype(np.uint8),
    }
    buf = HostPointBuffer.from_columns(schema, cols)
    path = tmp_path / "rand.las"
    write_all(buf, path)

    out = streaming_voxel_downsample(path, 1.0, chunk_points=4096,
                                     mode_runs=True)

    from pasture_tpu.buffers.device import PointBatch
    from pasture_tpu.io import read_all
    from pasture_tpu.ops.voxel import voxel_downsample
    import jax.numpy as jnp
    rbuf = read_all(path)
    full = voxel_downsample(
        PointBatch.from_host(rbuf), 1.0,
        bounds=(jnp.asarray(rbuf.get_converted(att.POSITION_3D).min(0),
                            jnp.float32), None),
        semantics="floor")
    nv = int(np.asarray(full.count))
    assert int(np.asarray(out.count)) == nv
    np.testing.assert_array_equal(
        np.asarray(out.data[att.CLASSIFICATION.name])[:nv],
        np.asarray(full.data[att.CLASSIFICATION.name])[:nv])

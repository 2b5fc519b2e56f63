"""Exact-ingest device path: read_batch + batch_positions."""

import jax.numpy as jnp
import numpy as np

from pasture_tpu.io import batch_positions, read_batch
from pasture_tpu.io.las import ATTRIBUTE_LOCAL_LAS_POSITION
from pasture_tpu.layout import attributes as att


def test_read_batch_exact_las(reference_test_data):
    batch = read_batch(f"{reference_test_data}/10_points_format_1.las")
    assert ATTRIBUTE_LOCAL_LAS_POSITION.name in batch.data
    assert batch.data[ATTRIBUTE_LOCAL_LAS_POSITION.name].dtype == jnp.int32
    # anchored decode reproduces the world ramp exactly in f32
    rel = np.asarray(batch_positions(batch))
    anchor = np.asarray(batch.meta["las_anchor"])
    scale = np.asarray(batch.meta["las_scale"])
    offset = np.asarray(batch.meta["las_offset"])
    world = rel + (anchor * scale + offset)[None, :]
    np.testing.assert_allclose(world[:10], np.stack([np.arange(10.0)] * 3, 1),
                               atol=1e-6)
    # other attributes ride along
    assert int(np.asarray(batch.count)) == 10
    np.testing.assert_array_equal(
        np.asarray(batch.data[att.INTENSITY.name])[:10], np.arange(10) * 255)


def test_read_batch_fallback_pnts(reference_test_data, tmp_path):
    batch = read_batch(f"{reference_test_data}/points.pnts")
    pos = batch_positions(batch)
    assert pos.shape[1] == 3
    assert int(np.asarray(batch.count)) > 0

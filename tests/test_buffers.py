"""Host + device buffer tests (reference:
pasture-core/src/containers/point_buffer.rs property tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pasture_tpu.buffers import HostPointBuffer, PointBatch
from pasture_tpu.layout import (DevicePolicy, PointSchema, attributes as att,
                                dtypes as dt)

SCHEMA = PointSchema.from_attributes_packed(
    [att.POSITION_3D, att.INTENSITY, att.CLASSIFICATION])


def random_buffer(rng, n=32):
    return HostPointBuffer.from_columns(SCHEMA, {
        "Position3D": rng.uniform(-100, 100, (n, 3)),
        "Intensity": rng.integers(0, 2**16, n, dtype=np.uint16),
        "Classification": rng.integers(0, 255, n, dtype=np.uint8),
    })


class TestHostBuffer:
    def test_interleaved_roundtrip(self, rng):
        buf = random_buffer(rng)
        raw = buf.to_bytes()
        assert len(raw) == 32 * SCHEMA.point_size
        back = HostPointBuffer.from_interleaved(SCHEMA, raw)
        for name in SCHEMA.names:
            assert np.array_equal(back.columns[name], buf.columns[name])

    def test_zero_copy_interleaved_view(self, rng):
        buf = random_buffer(rng)
        raw = np.frombuffer(buf.to_bytes(), np.uint8).copy()
        view = HostPointBuffer.from_interleaved(SCHEMA, raw, copy=False)
        # mutate underlying memory -> view must see it (ExternalMemoryBuffer)
        raw[SCHEMA.offset_of("Intensity")] = 0xFF
        raw[SCHEMA.offset_of("Intensity") + 1] = 0xFF
        assert view.get("Intensity")[0] == 0xFFFF

    def test_slice_and_filter(self, rng):
        buf = random_buffer(rng)
        s = buf.slice(4, 12)
        assert len(s) == 8
        assert np.array_equal(s.get("Intensity"), buf.get("Intensity")[4:12])
        mask = buf.get("Classification") > 128
        f = buf.filter(mask)
        assert len(f) == int(mask.sum())

    def test_append_with_conversion(self, rng):
        buf = random_buffer(rng, 8)
        other_schema = PointSchema.from_attributes_packed(
            [att.POSITION_3D.with_dtype(dt.VEC3F32), att.INTENSITY])
        other = HostPointBuffer.from_columns(other_schema, {
            "Position3D": np.ones((4, 3), np.float32),
            "Intensity": np.full(4, 5, np.uint16),
        })
        merged = buf.append(other)
        assert len(merged) == 12
        assert merged.get("Classification")[8:].sum() == 0  # default-filled
        assert np.allclose(merged.get("Position3D")[8:], 1.0)

    def test_get_converted(self, rng):
        buf = random_buffer(rng, 4)
        out = buf.get_converted(att.INTENSITY.with_dtype(dt.F64))
        assert out.dtype == np.float64
        assert np.array_equal(out, buf.get("Intensity").astype(np.float64))

    def test_transform_attribute(self, rng):
        buf = random_buffer(rng, 4)
        before = buf.get("Intensity").copy()
        buf.transform_attribute("Intensity", lambda v: v // 2)
        assert np.array_equal(buf.get("Intensity"), before // 2)


class TestPointBatch:
    def test_roundtrip_exact_policy(self, rng):
        buf = random_buffer(rng, 20)
        batch = PointBatch.from_host(buf, DevicePolicy.EXACT, pad_multiple=8)
        assert batch.capacity == 24
        assert int(batch.count) == 20
        back = batch.to_host()
        assert len(back) == 20
        for name in SCHEMA.names:
            assert np.array_equal(back.columns[name], buf.columns[name])

    def test_valid_mask(self, rng):
        batch = PointBatch.from_host(random_buffer(rng, 5), pad_multiple=8)
        mask = np.asarray(batch.valid_mask())
        assert mask.sum() == 5
        assert mask[:5].all() and not mask[5:].any()

    def test_is_pytree_and_jittable(self, rng):
        batch = PointBatch.from_host(random_buffer(rng, 8))

        @jax.jit
        def double_intensity(b: PointBatch) -> PointBatch:
            return b.with_column("Intensity", b.get("Intensity") * 2)

        out = double_intensity(batch)
        assert np.array_equal(
            np.asarray(out.get("Intensity")),
            np.asarray(batch.get("Intensity")) * 2)

    def test_gather_and_pad(self, rng):
        batch = PointBatch.from_host(random_buffer(rng, 8), pad_multiple=8)
        rev = batch.gather(jnp.arange(7, -1, -1))
        assert np.array_equal(
            np.asarray(rev.get("Intensity")),
            np.asarray(batch.get("Intensity"))[::-1])
        padded = batch.pad_to(16)
        assert padded.capacity == 16 and int(padded.count) == 8


def test_attribute_pusher(rng):
    from pasture_tpu.buffers.host import HostPointBuffer
    from pasture_tpu.layout import attributes as att
    from pasture_tpu.layout.schema import PointSchema
    import numpy as np
    import pytest

    schema = PointSchema.from_attributes([att.POSITION_3D, att.INTENSITY])
    pusher = HostPointBuffer.begin_push_attributes(schema)
    pusher.push_attribute_range(att.POSITION_3D, rng.uniform(0, 1, (5, 3)))
    pusher.push_attribute_range(att.INTENSITY,
                                rng.integers(0, 100, 3).astype(np.uint16))
    pusher.push_attribute_range(att.INTENSITY,
                                rng.integers(0, 100, 2).astype(np.uint16))
    pusher.push_attribute_range(att.POSITION_3D, rng.uniform(0, 1, (0, 3)))
    buf = pusher.done()
    assert len(buf) == 5

    bad = HostPointBuffer.begin_push_attributes(schema)
    bad.push_attribute_range(att.POSITION_3D, rng.uniform(0, 1, (4, 3)))
    bad.push_attribute_range(att.INTENSITY,
                             rng.integers(0, 100, 3).astype(np.uint16))
    with pytest.raises(ValueError, match="same count"):
        bad.done()


def test_concatenate_compacts_padded_batches(rng):
    a_host = random_buffer(rng, n=3)
    b_host = random_buffer(rng, n=5)
    a = PointBatch.from_host(a_host, capacity=8)
    b = PointBatch.from_host(b_host, capacity=8)

    cat = PointBatch.concatenate([a, b])
    assert int(cat.count) == 8
    got = cat.to_host().get("Intensity")
    want = np.concatenate([a_host.get("Intensity"), b_host.get("Intensity")])
    np.testing.assert_array_equal(got, want)
    # order within each input preserved, capacity stays static
    assert cat.capacity == 16

    # compact=False keeps the raw layout (caller asserts inputs are full)
    raw = PointBatch.concatenate([a, b], compact=False)
    ri = np.asarray(raw.data["Intensity"])
    np.testing.assert_array_equal(ri[:3], a_host.get("Intensity"))
    np.testing.assert_array_equal(ri[8:13], b_host.get("Intensity"))

    # also works under jit (static shapes)
    import jax
    cat2 = jax.jit(lambda x, y: PointBatch.concatenate([x, y]))(a, b)
    np.testing.assert_array_equal(
        np.asarray(cat2.data["Intensity"][:8]), want)

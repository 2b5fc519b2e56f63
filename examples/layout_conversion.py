"""Schema-to-schema conversion: dtype casts, custom mappings, bitfield
fan-out and transforms.

Counterpart of the reference's layout_conversion / custom_point_type
examples (pasture-core/examples/layout_conversion.rs,
custom_point_type.rs): the ``SchemaConverter`` reproduces
``BufferLayoutConverter`` semantics (buffer_conversion.rs:98-450) —
name-matched defaults, zero-filled missing targets, N:1 source fan-out,
and pre-/post-conversion transform functions.
"""

import numpy as np

from pasture_tpu.buffers.host import HostPointBuffer
from pasture_tpu.layout import attributes as att
from pasture_tpu.layout import dtypes as dt
from pasture_tpu.layout.attributes import PointAttribute
from pasture_tpu.layout.conversion import SchemaConverter
from pasture_tpu.layout.schema import PointSchema


def main():
    n = 8
    rng = np.random.default_rng(3)

    # -- 1. name-matched conversion with dtype casts (f64 -> f32 positions,
    #       u16 -> u8 intensity with Rust `as` wrapping semantics)
    src = PointSchema.from_attributes([att.POSITION_3D, att.INTENSITY])
    dst = PointSchema.from_attributes([
        att.POSITION_3D.with_dtype(dt.VEC3F32),
        att.INTENSITY.with_dtype(dt.U8),
    ])
    buffer = HostPointBuffer.from_columns(src, {
        att.POSITION_3D.name: rng.uniform(-10, 10, (n, 3)),
        att.INTENSITY.name: rng.integers(0, 65536, n).astype(np.uint16),
    })
    converted = buffer.convert_schema(dst)
    print("positions f64->f32:", converted.get(att.POSITION_3D).dtype)
    print("intensity u16->u8 (wrapping):",
          buffer.get(att.INTENSITY)[:4], "->",
          converted.get(att.INTENSITY)[:4])

    # -- 2. custom (user-defined) attributes, as in custom_point_type.rs
    HEAT = PointAttribute("Heat", dt.F32)
    custom = PointSchema.from_attributes([att.POSITION_3D, HEAT])
    hot = HostPointBuffer.from_columns(custom, {
        att.POSITION_3D.name: rng.uniform(0, 1, (n, 3)),
        HEAT.name: rng.random(n, dtype=np.float32),
    })
    print("custom schema:", hot.schema)

    # -- 3. fan-out + transform: one packed flags byte -> two unpacked
    #       attributes (the LAS bitfield pattern, raw_readers.rs:61-103)
    FLAGS = PointAttribute("PackedFlags", dt.U8)
    packed = PointSchema.from_attributes([FLAGS])
    unpacked = PointSchema.from_attributes(
        [att.RETURN_NUMBER, att.NUMBER_OF_RETURNS])
    conv = SchemaConverter.for_schemas_with_default(packed, unpacked)
    conv.set_custom_mapping_with_transformation(
        FLAGS, att.RETURN_NUMBER, lambda v: v & 0x07, True)
    conv.set_custom_mapping_with_transformation(
        FLAGS, att.NUMBER_OF_RETURNS, lambda v: (v >> 3) & 0x07, True)
    flags = (rng.integers(1, 4, n) | (rng.integers(1, 4, n) << 3)).astype(np.uint8)
    out = conv.convert({FLAGS.name: flags})
    print("packed:", flags[:4])
    print("return numbers:", out[att.RETURN_NUMBER.name][:4])
    print("number of returns:", out[att.NUMBER_OF_RETURNS.name][:4])


if __name__ == "__main__":
    main()

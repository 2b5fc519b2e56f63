"""Rust-`as` cast semantics + SchemaConverter contract tests
(reference: pasture-core/src/layout/conversion/)."""

import numpy as np
import pytest

from pasture_tpu.layout import (PointSchema, SchemaConverter, attributes as att,
                                convert_attribute_column, dtypes as dt,
                                rust_as_cast)


class TestRustAsCast:
    def test_int_narrowing_wraps(self):
        # Rust: 300u16 as u8 == 44; -1i16 as u8 == 255
        assert rust_as_cast(np.array([300], np.uint16), np.uint8)[0] == 44
        assert rust_as_cast(np.array([-1], np.int16), np.uint8)[0] == 255
        assert rust_as_cast(np.array([255], np.uint8), np.int8)[0] == -1

    def test_float_to_int_truncates_toward_zero(self):
        x = np.array([1.9, -1.9, 0.5], np.float64)
        assert list(rust_as_cast(x, np.int32)) == [1, -1, 0]

    def test_float_to_int_saturates(self):
        x = np.array([1e10, -1e10, np.nan, np.inf, -np.inf], np.float64)
        out = rust_as_cast(x, np.int8)
        assert list(out) == [127, -128, 0, 127, -128]
        out32 = rust_as_cast(x, np.uint32)
        assert list(out32) == [4294967295, 0, 0, 4294967295, 0]

    def test_float_to_int64_boundary(self):
        x = np.array([9.3e18, 2.0**63, 2.0**63 - 2048], np.float64)
        out = rust_as_cast(x, np.int64)
        assert out[0] == np.iinfo(np.int64).max
        assert out[1] == np.iinfo(np.int64).max
        assert out[2] == int(2.0**63 - 2048)

    def test_int_to_float(self):
        out = rust_as_cast(np.array([16777217], np.int64), np.float32)
        assert out[0] == np.float32(16777216.0)  # rounds like Rust as

    def test_f64_to_f32_overflow_is_inf(self):
        out = rust_as_cast(np.array([1e300], np.float64), np.float32)
        assert np.isinf(out[0])


class TestConvertColumn:
    def test_unit_conversion_copies(self):
        c = np.arange(5, dtype=np.uint16)
        out = convert_attribute_column(c, dt.U16, dt.U16)
        assert np.array_equal(out, c)
        out[0] = 99
        assert c[0] == 0  # copy, not view

    def test_vec3_componentwise(self):
        c = np.array([[1.5, -2.5, 3.9]], np.float64)
        out = convert_attribute_column(c, dt.VEC3F64, dt.VEC3I32)
        assert out.dtype == np.int32
        assert list(out[0]) == [1, -2, 3]

    def test_component_count_mismatch_raises(self):
        with pytest.raises(ValueError):
            convert_attribute_column(np.zeros((2, 3)), dt.VEC3F64, dt.F64)


class TestSchemaConverter:
    def test_name_matched_default(self):
        src = PointSchema.from_attributes_packed(
            [att.POSITION_3D, att.INTENSITY])
        dst = PointSchema.from_attributes_packed(
            [att.INTENSITY.with_dtype(dt.F32),
             att.POSITION_3D.with_dtype(dt.VEC3F32)])
        conv = SchemaConverter.for_schemas(src, dst)
        cols = {
            "Position3D": np.array([[1.0, 2.0, 3.0]], np.float64),
            "Intensity": np.array([7], np.uint16),
        }
        out = conv.convert(cols)
        assert out["Intensity"].dtype == np.float32
        assert out["Intensity"][0] == 7.0
        assert np.allclose(out["Position3D"][0], [1, 2, 3])

    def test_missing_source_raises_without_default(self):
        src = PointSchema.from_attributes_packed([att.POSITION_3D])
        dst = PointSchema.from_attributes_packed([att.POSITION_3D, att.GPS_TIME])
        with pytest.raises(ValueError):
            SchemaConverter.for_schemas(src, dst)
        conv = SchemaConverter.for_schemas_with_default(src, dst)
        out = conv.convert({"Position3D": np.zeros((3, 3))})
        assert np.array_equal(out["GpsTime"], np.zeros(3))

    def test_bitfield_fanout_with_source_transform(self):
        # the LAS basic-flags pattern: one u8 source -> several u8 targets
        flags_attr = att.PointAttribute("LASBasicFlags", dt.U8)
        src = PointSchema.from_attributes_packed([flags_attr])
        dst = PointSchema.from_attributes_packed(
            [att.RETURN_NUMBER, att.NUMBER_OF_RETURNS])
        conv = SchemaConverter.for_schemas_with_default(src, dst)
        conv.set_custom_mapping_with_transformation(
            flags_attr, att.RETURN_NUMBER, lambda f: f & 0b111, True)
        conv.set_custom_mapping_with_transformation(
            flags_attr, att.NUMBER_OF_RETURNS, lambda f: (f >> 3) & 0b111, True)
        flags = np.array([0b00101_011], np.uint8)
        out = conv.convert({"LASBasicFlags": flags})
        assert out["ReturnNumber"][0] == 0b011
        assert out["NumberOfReturns"][0] == 0b101

    def test_post_conversion_transform(self):
        # the LAS position pattern: i32 local -> f64 world via scale/offset
        local = att.PointAttribute("LASLocalPosition", dt.VEC3I32)
        src = PointSchema.from_attributes_packed([local])
        dst = PointSchema.from_attributes_packed([att.POSITION_3D])
        conv = SchemaConverter.for_schemas_with_default(src, dst)
        conv.set_custom_mapping_with_transformation(
            local, att.POSITION_3D, lambda p: p * 0.001 + 100.0, False)
        out = conv.convert({"LASLocalPosition": np.array([[1000, 2000, 3000]], np.int32)})
        assert np.allclose(out["Position3D"][0], [101.0, 102.0, 103.0])


def test_assume_owned_no_aliasing_across_targets():
    """Two targets fed by one source column (set_custom_mapping re-points
    m.source): at most ONE output may alias the input buffer, so an
    in-place mutation of one output never corrupts the other."""
    from pasture_tpu.layout import attributes as att
    from pasture_tpu.layout.conversion import SchemaConverter
    from pasture_tpu.layout.schema import PointSchema

    src = PointSchema.from_attributes([att.INTENSITY])
    dst = PointSchema.from_attributes([att.INTENSITY, att.POINT_SOURCE_ID])
    conv = SchemaConverter.for_schemas_with_default(src, dst)
    conv.set_custom_mapping(att.INTENSITY, att.POINT_SOURCE_ID)
    col = np.arange(8, dtype=np.uint16)
    out = conv.convert({att.INTENSITY.name: col}, assume_owned=True)
    a = out[att.INTENSITY.name]
    b = out[att.POINT_SOURCE_ID.name]
    assert not (a is b)
    a[0] = 999
    assert b[0] == 0

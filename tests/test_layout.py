"""Schema/layout tests — parity with pasture-core layout semantics
(reference: pasture-core/src/layout/point_layout.rs doctests + unit tests)."""

import numpy as np
import pytest

from pasture_tpu.layout import (PointAttribute, PointSchema, attributes as att,
                                dtypes as dt)
from pasture_tpu.layout.schema import align_to


def test_builtin_attribute_names_and_dtypes():
    # names must match pasture exactly (point_layout.rs:454-598)
    assert att.POSITION_3D.name == "Position3D"
    assert att.POSITION_3D.dtype is dt.VEC3F64
    assert att.INTENSITY.name == "Intensity"
    assert att.INTENSITY.dtype is dt.U16
    assert att.GPS_TIME.dtype is dt.F64
    assert att.COLOR_RGB.dtype is dt.VEC3U16
    assert att.SCAN_ANGLE_RANK.dtype is dt.I8
    assert att.SCAN_ANGLE.dtype is dt.I16
    assert att.WAVEFORM_DATA_OFFSET.dtype is dt.U64
    assert att.NORMAL.dtype is dt.VEC3F32
    assert len(att.BUILTIN_ATTRIBUTES) == 24  # 23 pasture builtins + ColorRGBA


def test_dtype_sizes():
    # PointAttributeDataType::size parity (point_layout.rs:54-87)
    assert dt.U8.size == 1 and dt.I64.size == 8
    assert dt.F32.size == 4 and dt.F64.size == 8
    assert dt.VEC3U8.size == 3
    assert dt.VEC3U16.size == 6
    assert dt.VEC3I32.size == 12
    assert dt.VEC3F32.size == 12
    assert dt.VEC3F64.size == 24
    assert dt.VEC4U8.size == 4
    assert dt.byte_array(7).size == 7
    assert dt.custom(10, 2).size == 10 and dt.custom(10, 2).min_alignment == 2


def test_schema_default_alignment():
    # repr(C)-style placement: offsets aligned to natural alignment
    s = PointSchema.from_attributes([att.CLASSIFICATION, att.INTENSITY,
                                     att.GPS_TIME])
    assert s.offset_of("Classification") == 0
    assert s.offset_of("Intensity") == 2     # u16 aligned to 2
    assert s.offset_of("GpsTime") == 8       # f64 aligned to 8
    assert s.size_of_point_entry() == 16     # padded to max align 8


def test_schema_packed():
    s = PointSchema.from_attributes_packed(
        [att.CLASSIFICATION, att.INTENSITY, att.GPS_TIME])
    assert s.offset_of("Intensity") == 1
    assert s.offset_of("GpsTime") == 3
    assert s.size_of_point_entry() == 11


def test_las_format0_default_schema_size():
    # LasPointFormat0 is repr(C, packed) and 35 bytes (las_types.rs:37)
    s = PointSchema.from_attributes_packed([
        att.POSITION_3D, att.INTENSITY, att.RETURN_NUMBER,
        att.NUMBER_OF_RETURNS, att.SCAN_DIRECTION_FLAG,
        att.EDGE_OF_FLIGHT_LINE, att.CLASSIFICATION, att.SCAN_ANGLE_RANK,
        att.USER_DATA, att.POINT_SOURCE_ID,
    ])
    assert s.size_of_point_entry() == 35


def test_duplicate_attribute_rejected():
    s = PointSchema()
    s.add_attribute(att.INTENSITY)
    with pytest.raises(ValueError):
        s.add_attribute(att.INTENSITY.with_dtype(dt.U32))


def test_schema_queries():
    s = PointSchema.from_attributes([att.POSITION_3D, att.INTENSITY])
    assert s.has_attribute(att.POSITION_3D)
    assert not s.has_attribute(att.POSITION_3D.with_dtype(dt.VEC3F32))
    assert s.has_attribute_with_name("Position3D")
    assert s.index_of("Intensity") == 1
    t = PointSchema.from_attributes_packed([att.INTENSITY, att.POSITION_3D])
    assert s.compare_without_offsets(t)
    assert s != t


def test_numpy_dtype_roundtrip():
    s = PointSchema.from_attributes_packed([att.POSITION_3D, att.INTENSITY])
    nd = s.to_numpy_dtype()
    assert nd.itemsize == 26
    rec = np.zeros(4, nd)
    rec["Position3D"][:] = [[1, 2, 3]] * 4
    rec["Intensity"][:] = [9, 8, 7, 6]
    raw = rec.tobytes()
    back = np.frombuffer(raw, nd)
    assert np.array_equal(back["Intensity"], [9, 8, 7, 6])


def test_align_to():
    assert align_to(0, 4) == 0
    assert align_to(1, 4) == 4
    assert align_to(4, 4) == 4
    assert align_to(13, 8) == 16
    assert align_to(13, 1) == 13

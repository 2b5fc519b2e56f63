"""3D Tiles .pnts reader/writer.

Parity with pasture's PntsReader/PntsWriter
(reference: pasture-io/src/tiles3d/pnts_reader.rs:41-463 and
pnts_writer.rs:67-597):

* 28-byte binary header (magic ``pnts``) + FeatureTable JSON header +
  columnar binary body;
* point semantics read in spec order: POSITION (Vec3f32), RGBA (Vec4u8),
  RGB (Vec3u8), NORMAL (Vec3f32); quantized positions are not supported
  (the reference has the same TODO, pnts_reader.rs:131);
* global semantics POINTS_LENGTH and RTC_CENTER; positions read either
  ``RelativeToCenter`` or ``Absolute`` (RTC_CENTER added, f64 math);
* the writer caches points in a *compatible layout* (only position, color,
  rgba, normal survive, with dtype conversion; other attributes are
  silently dropped — pnts_writer.rs:104-155) and writes everything on
  ``flush``.
"""

from __future__ import annotations

import enum
import struct
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple, Union

import numpy as np

from ...buffers.host import HostPointBuffer
from ...layout import attributes as att
from ...layout import dtypes as dt
from ...layout.attributes import PointAttribute
from ...layout.conversion import convert_attribute_column
from ...layout.schema import PointSchema
from ...math.aabb import AABB
from ..base import Metadata, PointReader, PointWriter
from .feature_table import (
    FeatureTableDataReference,
    read_feature_table_header,
    write_feature_table_header,
)

__all__ = ["PntsReader", "PntsWriter", "PntsMetadata", "PntsReadPositionsMode"]

_HEADER = struct.Struct("<4sIIIIII")  # magic, version, byteLength, ftJSON, ftBin, btJSON, btBin

#: semantics in 3D Tiles spec order -> (attribute, wire dtype)
_SEMANTICS: List[Tuple[str, PointAttribute]] = [
    ("POSITION", att.POSITION_3D.with_dtype(dt.VEC3F32)),
    ("RGBA", att.COLOR_RGBA),
    ("RGB", att.COLOR_RGB.with_dtype(dt.VEC3U8)),
    ("NORMAL", att.NORMAL),
]


class PntsReadPositionsMode(enum.Enum):
    """How RTC_CENTER affects read positions (pnts_reader.rs:30-39)."""

    RELATIVE_TO_CENTER = "relative"
    ABSOLUTE = "absolute"


class PntsMetadata(Metadata):
    """Global PNTS semantics (pnts_reader.rs PntsMetadata)."""

    def __init__(self, points_length: int,
                 rtc_center: Optional[np.ndarray],
                 quantized_volume_offset=None, quantized_volume_scale=None,
                 constant_rgba=None, batch_length=None) -> None:
        self.points_length = points_length
        self.rtc_center = rtc_center
        self.quantized_volume_offset = quantized_volume_offset
        self.quantized_volume_scale = quantized_volume_scale
        self.constant_rgba = constant_rgba
        self.batch_length = batch_length

    def bounds(self) -> Optional[AABB]:
        return None

    def number_of_points(self) -> Optional[int]:
        return self.points_length

    def get_named_field(self, name: str) -> Optional[Any]:
        return {
            "rtc_center": self.rtc_center,
            "points_length": self.points_length,
            "batch_length": self.batch_length,
        }.get(name)


class PntsReader(PointReader):
    """Reader for 3D Tiles .pnts files."""

    def __init__(self, source: Union[str, Path, bytes],
                 read_positions_mode: PntsReadPositionsMode =
                 PntsReadPositionsMode.ABSOLUTE) -> None:
        if isinstance(source, (str, Path)):
            with open(source, "rb") as f:
                buf = f.read()
        else:
            buf = bytes(source)
        magic, version, byte_length, ftj, ftb, btj, btb = _HEADER.unpack_from(
            buf, 0)
        if magic != b"pnts":
            raise ValueError(f"invalid PNTS magic {magic!r}")
        self.version = version
        ft_header = read_feature_table_header(buf, _HEADER.size, ftj)

        pl = ft_header.pop("POINTS_LENGTH", None)
        if pl is None:
            raise ValueError("PNTS feature table has no POINTS_LENGTH")
        n = int(pl)
        rtc = ft_header.pop("RTC_CENTER", None)
        rtc = np.asarray(rtc, np.float64) if rtc is not None else None
        self._metadata = PntsMetadata(
            n, rtc,
            ft_header.pop("QUANTIZED_VOLUME_OFFSET", None),
            ft_header.pop("QUANTIZED_VOLUME_SCALE", None),
            ft_header.pop("CONSTANT_RGBA", None),
            ft_header.pop("BATCH_LENGTH", None))
        body = _HEADER.size + ftj
        schema = PointSchema()
        cols: Dict[str, np.ndarray] = {}
        for semantic, attribute in _SEMANTICS:
            ref = ft_header.pop(semantic, None)
            if ref is None:
                continue
            if not isinstance(ref, FeatureTableDataReference):
                raise ValueError(
                    f"PNTS attribute {semantic} must be a data reference")
            schema.add_attribute(attribute, 1)
            start = body + ref.byte_offset
            npdt = attribute.dtype.np_component_dtype
            cnt = n * attribute.dtype.num_components
            arr = np.frombuffer(buf, npdt, cnt, start)
            cols[attribute.name] = arr.reshape(
                (n,) + attribute.dtype.np_shape).copy()

        # quantized positions: u16 triples dequantized into the volume
        # (beyond the reference, which TODOs this — pnts_reader.rs:131)
        qref = ft_header.pop("POSITION_QUANTIZED", None)
        if qref is not None and att.POSITION_3D.name not in cols:
            off = self._metadata.quantized_volume_offset
            sc = self._metadata.quantized_volume_scale
            if off is None or sc is None:
                raise ValueError(
                    "POSITION_QUANTIZED requires QUANTIZED_VOLUME_OFFSET "
                    "and QUANTIZED_VOLUME_SCALE")
            if not isinstance(qref, FeatureTableDataReference):
                raise ValueError(
                    "PNTS attribute POSITION_QUANTIZED must be a data "
                    "reference")
            q = np.frombuffer(buf, np.uint16, n * 3,
                              body + qref.byte_offset).reshape(n, 3)
            pos = (np.asarray(off, np.float64)[None, :]
                   + q.astype(np.float64) / 65535.0
                   * np.asarray(sc, np.float64)[None, :]).astype(np.float32)
            schema.add_attribute(att.POSITION_3D.with_dtype(dt.VEC3F32), 1)
            cols[att.POSITION_3D.name] = pos

        # CONSTANT_RGBA: materialize as a per-point color column when no
        # explicit color semantic is present (spec: per-point color wins)
        crgba = self._metadata.constant_rgba
        if (crgba is not None and att.COLOR_RGBA.name not in cols
                and att.COLOR_RGB.name not in cols):
            schema.add_attribute(att.COLOR_RGBA, 1)
            cols[att.COLOR_RGBA.name] = np.broadcast_to(
                np.asarray(crgba, np.uint8)[None, :], (n, 4)).copy()

        self._schema = schema
        self._columns = cols
        self._mode = read_positions_mode
        self._cursor = 0

        if (self._mode is PntsReadPositionsMode.ABSOLUTE
                and rtc is not None and att.POSITION_3D.name in cols):
            pos = cols[att.POSITION_3D.name].astype(np.float64) + rtc[None, :]
            cols[att.POSITION_3D.name] = pos.astype(np.float32)

    def read_positions_mode(self) -> PntsReadPositionsMode:
        return self._mode

    def get_metadata(self) -> PntsMetadata:
        return self._metadata

    def get_default_point_schema(self) -> PointSchema:
        return self._schema

    def read(self, count: int, schema: Optional[PointSchema] = None
             ) -> HostPointBuffer:
        n = min(count, self._metadata.points_length - self._cursor)
        start, stop = self._cursor, self._cursor + n
        self._cursor = stop
        cols = {k: v[start:stop] for k, v in self._columns.items()}
        buf = HostPointBuffer(self._schema, cols, validate=False)
        if schema is not None and schema != self._schema:
            return buf.convert_schema(schema, fill_missing_with_default=True)
        return buf


class PntsWriter(PointWriter):
    """Write-on-flush .pnts writer (reference pnts_writer.rs:67-597)."""

    def __init__(self, target: Union[str, Path], schema: PointSchema,
                 rtc_center: Optional[np.ndarray] = None) -> None:
        self._target = target
        self.source_schema = schema
        self._rtc_center = (np.asarray(rtc_center, np.float64)
                            if rtc_center is not None else None)
        # compatible layout: the surviving semantics in spec order
        compatible = PointSchema()
        self._mapping: List[Tuple[str, PointAttribute]] = []
        for semantic, target_attr in _SEMANTICS:
            if schema.has_attribute_with_name(target_attr.name):
                compatible.add_attribute(target_attr, 1)
                self._mapping.append((semantic, target_attr))
        self._schema = compatible
        self._cache: List[HostPointBuffer] = []
        self._flushed = False

    def get_default_point_schema(self) -> PointSchema:
        return self._schema

    def write(self, buffer: HostPointBuffer) -> None:
        cols = {}
        for _, target_attr in self._mapping:
            src = buffer.schema.member(target_attr.name)
            cols[target_attr.name] = convert_attribute_column(
                buffer.columns[target_attr.name], src.dtype, target_attr.dtype)
        self._cache.append(HostPointBuffer(self._schema, cols, validate=False))

    def flush(self) -> None:
        if self._flushed:
            return
        self._flushed = True
        merged = (HostPointBuffer.concat(self._cache) if self._cache
                  else HostPointBuffer.empty(self._schema))
        n = len(merged)

        body_parts: List[bytes] = []
        header: Dict[str, Any] = {"POINTS_LENGTH": n}
        if self._rtc_center is not None:
            header["RTC_CENTER"] = [float(v) for v in self._rtc_center]
        offset = 0
        for semantic, target_attr in self._mapping:
            col = merged.columns[target_attr.name]
            if (semantic == "POSITION" and self._rtc_center is not None):
                col = (col.astype(np.float64)
                       - self._rtc_center[None, :]).astype(np.float32)
            raw = np.ascontiguousarray(col).tobytes()
            header[semantic] = FeatureTableDataReference(offset)
            body_parts.append(raw)
            pad = (-len(raw)) % 8
            body_parts.append(b"\0" * pad)
            offset += len(raw) + pad
        body = b"".join(body_parts)

        ft_json = write_feature_table_header(header, 8, _HEADER.size)
        total = _HEADER.size + len(ft_json) + len(body)
        head = _HEADER.pack(b"pnts", 1, total, len(ft_json), len(body), 0, 0)
        with open(self._target, "wb") as f:
            f.write(head)
            f.write(ft_json)
            f.write(body)

    def close(self) -> None:
        self.flush()

"""LASzip codec driver (LAZ compression/decompression).

Replaces the reference's pure-Rust ``laz`` crate (pasture-io uses
``laz::LasZipDecompressor``/``Compressor``, raw_readers.rs:418-660).  The
entropy codec is inherently sequential per chunk, so the native C++ extension
decodes LAZ chunks in parallel on host threads; this module is the Python
driver and the chunk-table/VLR logic.
"""

from __future__ import annotations

import struct
from typing import List, Optional, Tuple

import numpy as np

from ..io.las.header import LasHeader, LasVlr

__all__ = ["LazVlrRecord", "LazDecompressor", "LazCompressor",
           "LASZIP_USER_ID", "LASZIP_RECORD_ID"]

LASZIP_USER_ID = "laszip encoded"
LASZIP_RECORD_ID = 22204


class LazVlrRecord:
    """Parsed LASzip VLR payload (laszip spec §2)."""

    def __init__(self, data: bytes) -> None:
        (self.compressor, self.coder, self.version_major, self.version_minor,
         self.version_revision, self.options, self.chunk_size,
         self.num_special_evlrs, self.offset_special_evlrs,
         self.num_items) = struct.unpack_from("<HHBBHIIqqH", data, 0)
        self.items: List[Tuple[int, int, int]] = []  # (type, size, version)
        off = 34
        for _ in range(self.num_items):
            self.items.append(struct.unpack_from("<HHH", data, off))
            off += 6

    @classmethod
    def from_header(cls, header: LasHeader) -> "LazVlrRecord":
        vlr = header.find_vlr(LASZIP_USER_ID, LASZIP_RECORD_ID)
        if vlr is None:
            raise ValueError("compressed LAS file has no LASzip VLR")
        return cls(vlr.data)


def _native():
    try:
        from . import _laszip  # compiled extension
        return _laszip
    except ImportError:
        return None


class LazDecompressor:
    """Decompresses LAZ point records to raw wire bytes."""

    def __init__(self, buf, header: LasHeader) -> None:
        self.header = header
        self.vlr = LazVlrRecord.from_header(header)
        native = _native()
        if native is None:
            raise NotImplementedError(
                "LAZ decompression requires the native laszip extension "
                "(build with `python setup.py build_ext --inplace`)")
        self._impl = native.Decompressor(
            bytes(buf), header.offset_to_point_data,
            header.point_record_length, header.point_count,
            header.point_format.number, self.vlr.chunk_size,
            self.vlr.compressor)

    def decompress_points(self, start: int, count: int) -> bytes:
        return self._impl.decompress(start, count)


class LazCompressor:
    """Compresses raw wire records into a LAZ stream."""

    def __init__(self, stream, header: LasHeader) -> None:
        native = _native()
        if native is None:
            raise NotImplementedError(
                "LAZ compression requires the native laszip extension")
        self.header = header
        self.stream = stream
        raise NotImplementedError("LAZ write path lands with the native codec")

    def compress_points(self, records: bytes) -> None:
        raise NotImplementedError

    def done(self) -> None:
        raise NotImplementedError

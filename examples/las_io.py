"""LAS/LAZ I/O: read, convert schemas, write (reference simple_io / las_io /
fast_las_parsing examples rolled into one).

Usage: python examples/las_io.py <input.las|.laz> [output.laz]
"""

import sys

import numpy as np

from pasture_tpu.io import read_all, write_all
from pasture_tpu.io.las import LasReader
from pasture_tpu.layout import attributes as att
from pasture_tpu.layout import dtypes as dt
from pasture_tpu.layout.schema import PointSchema


def main(path, out=None):
    # 1. convenience one-liner
    buffer = read_all(path)
    print(f"{len(buffer)} points, schema: {buffer.schema}")

    # 2. fastest path: exact binary schema, mmap, zero decode
    #    (the reference's fast_las_parsing example)
    with LasReader(path, point_schema_matches_memory_layout=True) as reader:
        raw = reader.read_all()
        print("exact wire schema:", raw.schema)

    # 3. converting read into a custom schema (f32 positions)
    target = PointSchema.from_attributes([
        att.POSITION_3D.with_dtype(dt.VEC3F32), att.INTENSITY])
    with LasReader(path) as reader:
        small = reader.read_all(schema=target)
        print("f32 positions:", small.get(att.POSITION_3D.name)[:3])

    if out:
        write_all(buffer, out)   # .laz extension -> native LASzip compress
        print("wrote", out)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else None)

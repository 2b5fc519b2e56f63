"""pasture_tpu — TPU-native point-cloud + scan-registration engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
igd-geo/pasture Rust workspace (typed attribute schemas, LAS/LAZ/ASCII/
3D-Tiles I/O, point-cloud algorithms), re-designed device-first:

* data lives as SoA :class:`~pasture_tpu.buffers.PointBatch` pytrees,
  sharded over ``jax.sharding.Mesh`` axes;
* the hot per-point algorithms (transform, bounds, Morton keys, voxel-grid
  downsampling, RANSAC, normals) are XLA/Pallas kernels;
* an added distributed registration layer (ICP + pose graph) scales over
  multi-host meshes with XLA collectives.

Layer map (bottom-up, mirroring SURVEY.md §1):
  layout -> buffers -> io -> ops -> parallel -> registration -> tools
"""

__version__ = "0.1.0"

from . import layout  # noqa: F401
from .buffers import HostPointBuffer, PointBatch  # noqa: F401
from .layout import PointAttribute, PointSchema  # noqa: F401
from .math import AABB  # noqa: F401

"""Distributed layer: device meshes, sharded batches, spatial partitioning,
distributed registration.

The reference is strictly single-node (SURVEY.md §2.5) — this package is
where the TPU build *introduces* the distributed capability: points shard
over a ``jax.sharding.Mesh`` axis for map-style ops, Morton-keyed block
partitioning redistributes points spatially for neighbourhood ops, and the
registration solves reduce their normal equations over the mesh with XLA
collectives (psum) instead of any NCCL/MPI analog.
"""

from .mesh import make_mesh, batch_sharding, shard_batch  # noqa: F401
from .ops import sharded_bounds, sharded_voxel_downsample, \
    sharded_voxel_downsample_merged, \
    distributed_normals  # noqa: F401
from .partition import morton_partition, MortonPartitionSpec  # noqa: F401
from .distributed import distributed_icp, distributed_icp_partitioned, \
    distributed_pose_graph  # noqa: F401
from .halo import halo_exchange, halo_exchange_local  # noqa: F401
from .ingest import sharded_read_all  # noqa: F401
from .multihost import initialize_multihost, global_mesh  # noqa: F401

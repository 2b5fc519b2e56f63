"""Multi-host initialization + process-spanning meshes.

One-call setup for running the distributed layer across hosts: initializes
``jax.distributed`` (GCE TPU metadata or explicit coordinator), then builds
meshes over the global device set.  The collectives in this package
(`psum`, `all_to_all`, `ppermute`) are topology-agnostic — laid out so a
1-D points axis maps onto ICI within a host and DCN across hosts only at
the axis seams.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["initialize_multihost", "global_mesh"]


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed.  On Cloud TPU all arguments are
    auto-detected from the metadata server; pass them explicitly elsewhere
    (e.g. ``"host0:8476"``, 2, 0/1)."""
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def global_mesh(axes: Sequence[str] = ("points",),
                shape: Optional[Tuple[int, ...]] = None) -> Mesh:
    """Mesh over every device of every process.

    Default 1-D over all global devices; 2-D shapes like
    ``axes=("hosts", "points"), shape=(num_hosts, devices_per_host)`` keep
    host-local collectives on ICI and cross-host traffic on DCN explicitly.
    """
    devices = np.asarray(jax.devices())
    if shape is None:
        shape = (len(devices),) if len(axes) == 1 else None
    if shape is None:
        raise ValueError("shape required for multi-axis meshes")
    return Mesh(devices.reshape(shape), tuple(axes))

"""Point buffers: host SoA/interleaved + device PointBatch pytree."""

from .device import PointBatch
from .host import HostPointBuffer

__all__ = ["HostPointBuffer", "PointBatch"]

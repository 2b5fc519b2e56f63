"""Scan registration: ICP + pose graph (the TPU-native extension layer).

The reference has no registration capability; this package is the
framework's extension mandated by the north star (/root/repo/BASELINE.json):
ICP scan-to-map alignment and a keyframed pose graph whose Gauss-Newton
normal equations are reduced across the device mesh with collectives.
"""

from .se3 import (  # noqa: F401
    se3_exp,
    se3_log,
    so3_exp,
    so3_log,
    transform_points,
)
from .icp import icp, IcpResult  # noqa: F401
from .pose_graph import PoseGraph, optimize_pose_graph  # noqa: F401

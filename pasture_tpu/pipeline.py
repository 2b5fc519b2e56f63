"""High-level registration pipeline: scans in, map + trajectory out.

The framework's flagship composition — host ingest, device voxel
downsampling, scan-to-map ICP odometry, keyframed pose graph — in one
object.  Each stage is the public building block (io, ops, registration),
so the pipeline is also living documentation of how they fit together.

    pipe = RegistrationPipeline(voxel_size=0.2)
    for scan in scans:                       # HostPointBuffer or (N,3) array
        pipe.add_scan(scan)
    pipe.optimize()
    traj = pipe.trajectory()                 # (K, 3) translations
    map_pts = pipe.map_points()              # merged, downsampled map
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Union

import jax.numpy as jnp
import numpy as np

from .buffers.device import PointBatch
from .buffers.host import HostPointBuffer
from .layout import attributes as att
from .layout.schema import PointSchema
from .registration import PoseGraph, icp, optimize_pose_graph
from .registration.se3 import transform_points

__all__ = ["RegistrationPipeline"]


def _positions(scan) -> np.ndarray:
    if isinstance(scan, HostPointBuffer):
        return scan.get_converted(att.POSITION_3D)
    return np.asarray(scan, np.float64).reshape(-1, 3)


@dataclasses.dataclass
class _Keyframe:
    points: np.ndarray        # local-frame positions (downsampled)
    rotation: np.ndarray      # world pose
    translation: np.ndarray


class RegistrationPipeline:
    """Incremental scan registration with keyframing.

    Each added scan is aligned to the previous keyframe's points with
    point-to-plane ICP; a new keyframe is spawned when motion exceeds the
    keyframe distance.  ``optimize`` runs the pose graph over the odometry
    chain (plus any loop-closure edges added via :meth:`add_loop_closure`).

    Example — three scans of one scene taken 0.1 m apart recover a 0.2 m
    trajectory:

    >>> import numpy as np
    >>> from pasture_tpu.pipeline import RegistrationPipeline
    >>> rng = np.random.default_rng(0)
    >>> scene = rng.uniform(0, 5, (512, 3))
    >>> pipe = RegistrationPipeline(voxel_size=0.25,
    ...                             keyframe_distance=0.05,
    ...                             icp_iterations=8)
    >>> for shift in (0.0, 0.1, 0.2):
    ...     pipe.add_scan(scene + np.asarray([shift, 0.0, 0.0]))
    >>> traj = pipe.trajectory()
    >>> len(traj)
    3
    >>> bool(abs(np.linalg.norm(traj[2] - traj[0]) - 0.2) < 0.02)
    True
    """

    def __init__(self, voxel_size: float = 0.1,
                 max_correspondence_distance: float = 1.0,
                 icp_iterations: int = 20,
                 keyframe_distance: float = 0.5,
                 point_to_plane: bool = True,
                 mesh=None, distributed_halo: int = 512,
                 distributed_capacity_factor: float = 4.0) -> None:
        """``mesh`` (opt-in distributed mode): a
        :func:`pasture_tpu.parallel.points_mesh` — scan-to-keyframe
        alignment then runs
        :func:`~pasture_tpu.parallel.distributed.distributed_icp_partitioned`
        (both clouds Morton-partitioned, ``distributed_halo`` boundary
        rows exchanged) instead of single-device :func:`icp`."""
        self.voxel_size = voxel_size
        self.max_corr = max_correspondence_distance
        self.icp_iterations = icp_iterations
        self.keyframe_distance = keyframe_distance
        self.point_to_plane = point_to_plane
        self.mesh = mesh
        self.distributed_halo = distributed_halo
        self.distributed_capacity_factor = distributed_capacity_factor
        self.keyframes: List[_Keyframe] = []
        self._edges: List[tuple] = []     # (i, j, rel_rot, rel_t)
        self._last_result = None

    # ---- ingest ---------------------------------------------------------------
    def _downsample(self, pos: np.ndarray) -> np.ndarray:
        """Device voxel-grid downsample, centroid (mean) policy — the
        same engine as the headline bench (ops/voxel.py; reduction
        semantics per voxel_grid.rs:443-700).  Grid anchored at the cloud
        minimum with ``floor`` binning."""
        if self.voxel_size <= 0 or len(pos) == 0:
            return pos
        from .ops import voxel_downsample
        schema = PointSchema.from_attributes([att.POSITION_3D])
        cap = max(-(-len(pos) // 8) * 8, 8)
        # anchor-relative device math: without jax_enable_x64 the device
        # column is f32, which at survey/UTM magnitudes (~1e6) quantizes
        # centroids to ~0.06-0.12 m.  Subtracting the f64 cloud minimum on
        # the host first bounds the device values by the scan extent (f32
        # resolution ~1e-5 m at 100 m), and the anchor is restored in f64.
        anchor = pos.min(axis=0)
        rel = pos - anchor[None, :]
        col = jnp.asarray(np.pad(rel, [(0, cap - len(pos)), (0, 0)]))
        batch = PointBatch({att.POSITION_3D.name: col},
                           jnp.asarray(len(pos), jnp.int32), schema, {})
        out = voxel_downsample(batch, self.voxel_size,
                               bounds=(jnp.zeros(3, col.dtype), None),
                               semantics="floor")
        n = int(out.count)
        return np.asarray(out.data[att.POSITION_3D.name][:n],
                          np.float64) + anchor[None, :]

    def _align(self, src: np.ndarray, tgt: np.ndarray):
        """One scan-to-keyframe alignment: single-device ICP, or the
        partitioned distributed path when a mesh was supplied.

        Device math runs on ANCHOR-RELATIVE coordinates (the f64 target
        minimum subtracted on the host): at survey/UTM magnitudes f32
        device clouds would quantize to ~0.1 m and the pairwise-distance
        cancellation would swamp the correspondences.  Rigid alignment of
        the anchored clouds recovers the same rotation; the true
        translation is restored exactly as ``t = t' + A - R @ A``."""
        anchor = np.asarray(tgt, np.float64).min(axis=0)
        src_a = np.asarray(src, np.float64) - anchor[None, :]
        tgt_a = np.asarray(tgt, np.float64) - anchor[None, :]
        if self.mesh is None:
            result = icp(jnp.asarray(src_a), jnp.asarray(tgt_a),
                         max_correspondence_distance=self.max_corr,
                         iterations=self.icp_iterations,
                         point_to_plane=self.point_to_plane)
        else:
            from .parallel.distributed import distributed_icp_partitioned

            def batch_of(p):
                schema = PointSchema.from_attributes([att.POSITION_3D])
                cap = max(-(-len(p) // 8) * 8, 8)
                col = jnp.asarray(np.pad(np.asarray(p, np.float64),
                                         [(0, cap - len(p)), (0, 0)]))
                return PointBatch({att.POSITION_3D.name: col},
                                  jnp.asarray(len(p), jnp.int32), schema, {})

            result, dropped = distributed_icp_partitioned(
                batch_of(src_a), batch_of(tgt_a), self.mesh,
                halo=self.distributed_halo,
                capacity_factor=self.distributed_capacity_factor,
                max_correspondence_distance=self.max_corr,
                iterations=self.icp_iterations,
                point_to_plane=self.point_to_plane)
            if int(dropped) != 0:
                raise RuntimeError(
                    f"distributed partitioning dropped {int(dropped)} "
                    f"points — raise capacity_factor / rebalance the "
                    f"partition")
        rot = np.asarray(result.rotation, np.float64)
        t = (np.asarray(result.translation, np.float64)
             + anchor - rot @ anchor)
        return dataclasses.replace(
            result, rotation=jnp.asarray(rot), translation=jnp.asarray(t))

    def add_scan(self, scan: Union[HostPointBuffer, np.ndarray]) -> None:
        pos = self._downsample(_positions(scan))
        if not self.keyframes:
            self.keyframes.append(_Keyframe(pos, np.eye(3), np.zeros(3)))
            return
        ref = self.keyframes[-1]
        result = self._align(pos, ref.points)
        rel_rot = np.asarray(result.rotation, np.float64)
        rel_t = np.asarray(result.translation, np.float64)
        self._last_result = result
        if np.linalg.norm(rel_t) >= self.keyframe_distance or \
                np.trace(rel_rot) < 3.0 - 1e-3:
            rot = ref.rotation @ rel_rot
            t = ref.rotation @ rel_t + ref.translation
            k = len(self.keyframes)
            self.keyframes.append(_Keyframe(pos, rot, t))
            self._edges.append((k - 1, k, rel_rot, rel_t))

    def add_loop_closure(self, i: int, j: int,
                         rel_rotation: Optional[np.ndarray] = None,
                         rel_translation: Optional[np.ndarray] = None) -> None:
        """Add an edge between keyframes i and j.  Without an explicit
        measurement, ICP aligns keyframe j's points to keyframe i's."""
        if rel_rotation is None or rel_translation is None:
            result = self._align(self.keyframes[j].points,
                                 self.keyframes[i].points)
            rel_rotation = np.asarray(result.rotation, np.float64)
            rel_translation = np.asarray(result.translation, np.float64)
        self._edges.append((i, j, rel_rotation, rel_translation))

    # ---- solve ----------------------------------------------------------------
    def graph(self) -> PoseGraph:
        k = len(self.keyframes)
        if not self._edges:
            raise ValueError("need at least two keyframes with an edge")
        edges = np.asarray([[e[0], e[1]] for e in self._edges], np.int32)
        return PoseGraph(
            rotations=jnp.asarray(np.stack(
                [kf.rotation for kf in self.keyframes])),
            translations=jnp.asarray(np.stack(
                [kf.translation for kf in self.keyframes])),
            edges=jnp.asarray(edges),
            rel_rotations=jnp.asarray(np.stack([e[2] for e in self._edges])),
            rel_translations=jnp.asarray(np.stack(
                [e[3] for e in self._edges])))

    def optimize(self, iterations: int = 10) -> np.ndarray:
        """Pose-graph solve; updates keyframe poses, returns the cost curve."""
        optimized, costs = optimize_pose_graph(self.graph(),
                                               iterations=iterations)
        for k, kf in enumerate(self.keyframes):
            kf.rotation = np.asarray(optimized.rotations[k], np.float64)
            kf.translation = np.asarray(optimized.translations[k], np.float64)
        return np.asarray(costs)

    # ---- outputs --------------------------------------------------------------
    def trajectory(self) -> np.ndarray:
        return np.stack([kf.translation for kf in self.keyframes])

    def map_points(self) -> np.ndarray:
        """All keyframe points in world frame, voxel-merged."""
        world = [np.asarray(transform_points(
            jnp.asarray(kf.rotation), jnp.asarray(kf.translation),
            jnp.asarray(kf.points)))
            for kf in self.keyframes]
        return self._downsample(np.concatenate(world))

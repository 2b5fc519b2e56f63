"""ICP scan-to-map registration on device.

TPU-native design: correspondences come from brute-force nearest-neighbour
*matmuls* (tiled (Q, N) distance matrices hit the MXU — the device-native
replacement for a kd-tree), the 6x6 Gauss-Newton normal equations are built
with masked einsums and solved with a dense Cholesky, and the whole
iteration runs inside one ``lax.scan`` — a fixed number of iterations, no
data-dependent control flow (XLA compiles it once).

Supports point-to-point and point-to-plane objectives; point-to-plane uses
target normals (pasture_tpu.algorithms.normals if not provided).
Correspondences beyond ``max_correspondence_distance`` are soft-rejected by
zero weights (static shapes throughout).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .se3 import se3_exp, skew, transform_points

__all__ = ["icp", "IcpResult", "nearest_neighbors"]


@dataclasses.dataclass
class IcpResult:
    """Final alignment: ``rotation @ p + translation`` maps source into the
    target frame."""

    rotation: jnp.ndarray      # (3, 3)
    translation: jnp.ndarray   # (3,)
    rmse: jnp.ndarray          # scalar: inlier RMSE at the last iteration
    num_inliers: jnp.ndarray   # scalar int
    iterations: int


def nearest_neighbors(query: jnp.ndarray, points: jnp.ndarray,
                      points_valid: jnp.ndarray, tile: int = 2048
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(indices, sq_distances) of the nearest target point for each query.

    Tiled so the distance matrix never exceeds ``tile x N``; the -2 q.p^T
    term is an MXU matmul."""
    n = query.shape[0]
    pad = (-n) % tile
    q = jnp.pad(query, ((0, pad), (0, 0))).reshape(-1, tile, 3)
    p2 = jnp.sum(points * points, axis=1)[None, :]
    big = jnp.asarray(jnp.inf, query.dtype)

    def one_tile(qt):
        q2 = jnp.sum(qt * qt, axis=1, keepdims=True)
        d2 = q2 + p2 - 2.0 * (qt @ points.T)
        d2 = jnp.where(points_valid[None, :], d2, big)
        idx = jnp.argmin(d2, axis=1)
        return idx.astype(jnp.int32), jnp.take_along_axis(
            d2, idx[:, None], axis=1)[:, 0]

    idx, d2 = jax.lax.map(one_tile, q)
    return idx.reshape(-1)[:n], d2.reshape(-1)[:n]


def _solve_gn(h: jnp.ndarray, b: jnp.ndarray, damping: float) -> jnp.ndarray:
    h = h + damping * jnp.eye(6, dtype=h.dtype)
    l = jnp.linalg.cholesky(h)
    y = jax.scipy.linalg.solve_triangular(l, b, lower=True)
    return jax.scipy.linalg.solve_triangular(l.T, y, lower=False)


def _icp_step(source, source_valid, target, target_valid, target_normals,
              rot, t, max_dist_sq, point_to_plane, tile, damping):
    moved = transform_points(rot, t, source)
    idx, d2 = nearest_neighbors(moved, target, target_valid, tile)
    w = (source_valid & (d2 < max_dist_sq)).astype(source.dtype)

    matched = target[idx]
    if point_to_plane:
        nrm = target_normals[idx]
        r = jnp.sum((moved - matched) * nrm, axis=1)           # (N,)
        # J_i = [n_i^T, (p_i x n_i)^T] for twist [rho, phi]
        j = jnp.concatenate([nrm, jnp.cross(moved, nrm)], axis=1)  # (N, 6)
        h = jnp.einsum("ni,nj,n->ij", j, j, w)
        b = jnp.einsum("ni,n,n->i", j, r, w)
    else:
        r = moved - matched                                     # (N, 3)
        # J_i = [I, -[p]_x] per residual row
        eye = jnp.broadcast_to(jnp.eye(3, dtype=source.dtype),
                               (moved.shape[0], 3, 3))
        j = jnp.concatenate([eye, -skew(moved)], axis=2)        # (N, 3, 6)
        h = jnp.einsum("nai,naj,n->ij", j, j, w)
        b = jnp.einsum("nai,na,n->i", j, r, w)

    xi = -_solve_gn(h, b, damping)
    d_rot, d_t = se3_exp(xi)
    new_rot = d_rot @ rot
    new_t = (d_rot @ t[:, None])[:, 0] + d_t

    nin = jnp.sum(w)
    rmse = jnp.sqrt(jnp.sum(d2 * w) / jnp.maximum(nin, 1.0))
    return new_rot, new_t, rmse, nin


def icp(source: jnp.ndarray, target: jnp.ndarray,
        source_valid: Optional[jnp.ndarray] = None,
        target_valid: Optional[jnp.ndarray] = None,
        init_rotation: Optional[jnp.ndarray] = None,
        init_translation: Optional[jnp.ndarray] = None,
        max_correspondence_distance: float = 1.0,
        iterations: int = 20,
        point_to_plane: bool = False,
        target_normals: Optional[jnp.ndarray] = None,
        tile: int = 2048,
        damping: float = 1e-6) -> IcpResult:
    """Align ``source`` (N, 3) to ``target`` (M, 3).

    Runs ``iterations`` Gauss-Newton steps inside a ``lax.scan`` (static
    shape, single compilation).  ``*_valid`` mask padded rows.
    """
    dtype = source.dtype
    if source_valid is None:
        source_valid = jnp.ones(source.shape[0], bool)
    if target_valid is None:
        target_valid = jnp.ones(target.shape[0], bool)
    rot0 = jnp.eye(3, dtype=dtype) if init_rotation is None \
        else init_rotation.astype(dtype)
    t0 = jnp.zeros(3, dtype) if init_translation is None \
        else init_translation.astype(dtype)
    if point_to_plane:
        if target_normals is None:
            from ..algorithms.normals import _normals_device
            target_normals, _ = _normals_device(target, target_valid, 16,
                                                tile)
        target_normals = target_normals.astype(dtype)
    else:
        target_normals = jnp.zeros_like(target)

    max_d2 = jnp.asarray(max_correspondence_distance ** 2, dtype)

    def body(carry, _):
        rot, t = carry
        new_rot, new_t, rmse, nin = _icp_step(
            source, source_valid, target, target_valid, target_normals,
            rot, t, max_d2, point_to_plane, tile, damping)
        return (new_rot, new_t), (rmse, nin)

    (rot, t), (rmses, nins) = jax.lax.scan(
        body, (rot0, t0), None, length=iterations)
    return IcpResult(rot, t, rmses[-1], nins[-1].astype(jnp.int32),
                     iterations)

"""Normal estimation (parity: pasture-algorithms/src/normal_estimation.rs).

The reference builds a kd-tree, queries k-NN per point, computes the
neighborhood covariance and solves the 3x3 eigenproblem in closed form
(normal_estimation.rs:79-484); normal = eigenvector of the smallest
eigenvalue, curvature = |λ₀ / (λ₀+λ₁+λ₂)|, normals unoriented.

TPU-native design: brute-force k-NN as tiled distance *matmuls* — the
pairwise -2·x·yᵀ term is MXU work, which beats tree traversal on this
hardware for the batch sizes a chip holds; neighborhoods then reduce to
covariances and a vectorised closed-form symmetric 3x3 eigensolve.  For
clouds too large for O(N²/tiles), pre-partition with Morton sort and run
per-block (see pasture_tpu.parallel).
"""

from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..buffers.device import PointBatch
from ..buffers.host import HostPointBuffer
from ..layout import attributes as att

__all__ = ["compute_normals", "knn_indices", "compute_centroid"]


def compute_centroid(buffer: Union[HostPointBuffer, PointBatch]) -> np.ndarray:
    """Mean position (reference ``compute_centroid``,
    normal_estimation.rs:198)."""
    if isinstance(buffer, PointBatch):
        n = int(np.asarray(buffer.count))
        pos = np.asarray(buffer.data[att.POSITION_3D.name])[:n]
    else:
        pos = buffer.get_converted(att.POSITION_3D)
    return pos.astype(np.float64).mean(axis=0)


def _knn_tile(query: jnp.ndarray, points: jnp.ndarray, valid: jnp.ndarray,
              k: int) -> jnp.ndarray:
    """k nearest of each query row among ``points``: one (Q, N) distance
    matrix via matmul + top_k."""
    q2 = jnp.sum(query * query, axis=1, keepdims=True)
    p2 = jnp.sum(points * points, axis=1)[None, :]
    d2 = q2 + p2 - 2.0 * (query @ points.T)
    d2 = jnp.where(valid[None, :], d2, jnp.inf)
    _, idx = jax.lax.top_k(-d2, k)
    return idx


def knn_indices(positions: jnp.ndarray, valid: jnp.ndarray, k: int,
                tile: int = 2048) -> jnp.ndarray:
    """(N, k) indices of the k nearest neighbours (self included, as in the
    reference's kd-tree query).  Tiled over queries to bound the distance
    matrix at ``tile x N``."""
    n = positions.shape[0]
    pad = (-n) % tile
    q = jnp.pad(positions, ((0, pad), (0, 0)))
    q = q.reshape(-1, tile, 3)
    idx = jax.lax.map(lambda t: _knn_tile(t, positions, valid, k), q)
    return idx.reshape(-1, k)[:n]


def _eigh3_smallest(cov: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Smallest eigenvalue + eigenvector of symmetric 3x3 matrices (..., 3, 3)
    via the trigonometric closed form (same approach as the reference's
    characteristic-polynomial solve, normal_estimation.rs:308-455)."""
    a = cov
    tr = jnp.trace(a, axis1=-2, axis2=-1)
    q = tr / 3.0
    a_q = a - q[..., None, None] * jnp.eye(3, dtype=a.dtype)
    p2 = jnp.sum(a_q * a_q, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-30))
    b = a_q / p[..., None, None]
    detb = jnp.linalg.det(b)
    phi = jnp.arccos(jnp.clip(detb / 2.0, -1.0, 1.0)) / 3.0
    # eigenvalues q + 2p cos(phi + 2πk/3), k=0 largest .. smallest
    lam0 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)   # smallest
    lam2 = q + 2.0 * p * jnp.cos(phi)                          # largest
    lam1 = tr - lam0 - lam2

    # eigenvector of lam0: columns of (A - lam1 I)(A - lam2 I)
    m = (a - lam1[..., None, None] * jnp.eye(3, dtype=a.dtype)) @ \
        (a - lam2[..., None, None] * jnp.eye(3, dtype=a.dtype))
    norms = jnp.linalg.norm(m, axis=-2)
    best = jnp.argmax(norms, axis=-1)
    vec = jnp.take_along_axis(
        m, best[..., None, None].repeat(3, axis=-2), axis=-1)[..., 0]
    nrm = jnp.linalg.norm(vec, axis=-1, keepdims=True)
    # degenerate (isotropic) neighbourhoods: fall back to +z like a plane
    fallback = jnp.zeros_like(vec).at[..., 2].set(1.0)
    vec = jnp.where(nrm > 1e-20, vec / jnp.maximum(nrm, 1e-30), fallback)
    return lam0, vec


def _normals_device(pos: jnp.ndarray, valid: jnp.ndarray, k: int,
                    tile: int = 2048):
    idx = knn_indices(pos, valid, k, tile)
    neigh = pos[idx]                                  # (N, k, 3)
    mean = jnp.mean(neigh, axis=1, keepdims=True)
    centered = neigh - mean
    cov = jnp.einsum("nki,nkj->nij", centered, centered) / k
    lam0, normal = _eigh3_smallest(cov)
    tr = jnp.trace(cov, axis1=-2, axis2=-1)
    curvature = jnp.where(tr != 0.0, jnp.abs(lam0 / tr), 0.0)
    return normal, curvature


def compute_normals(buffer: Union[HostPointBuffer, PointBatch], k_nn: int,
                    tile: int = 2048) -> Tuple[np.ndarray, np.ndarray]:
    """Per-point (normals (N,3), curvature (N,)).

    Panics->raises like the reference for clouds of fewer than 3 points or
    ``k_nn < 3`` (normal_estimation.rs:86-92)."""
    if isinstance(buffer, PointBatch):
        n = int(np.asarray(buffer.count))
        pos = buffer.data[att.POSITION_3D.name]
        valid = buffer.valid_mask()
    else:
        n = len(buffer)
        pos = jnp.asarray(buffer.get_converted(att.POSITION_3D))
        valid = jnp.ones(n, bool)
    if n < 3:
        raise ValueError("The point cloud is too small. Please use a point "
                         "cloud that has 3 or more points!")
    if k_nn < 3:
        raise ValueError("The k nearest neighbors attribute is too small!")
    normal, curvature = jax.jit(_normals_device, static_argnums=(2, 3))(
        pos, valid, k_nn, tile)
    return np.asarray(normal)[:n], np.asarray(curvature)[:n]

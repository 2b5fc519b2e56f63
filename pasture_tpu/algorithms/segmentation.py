"""RANSAC plane/line segmentation.

Parity with pasture-algorithms/src/segmentation.rs:1-459: ``Plane`` in
coordinate form ax+by+cz+d=0 built from 3 random points, ``Line`` from 2,
hypotheses ranked by inlier count (distance < threshold), best wins.

TPU-native design (SURVEY.md §2.5): where the reference fans hypothesis
generation out over rayon threads (segmentation.rs:180-197), the device path
evaluates the whole hypothesis batch at once — sample all minimal subsets
with one PRNG key, compute an (iterations, N) distance matrix in tiles, and
``argmax`` the inlier counts.  Host ``_serial``/``_par`` variants keep the
reference's sequential contract for parity tests (both map to the same
vectorised numpy loop; Python threads would add nothing).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..buffers.device import PointBatch
from ..buffers.host import HostPointBuffer
from ..layout import attributes as att

__all__ = [
    "Plane", "Line",
    "ransac_plane_serial", "ransac_plane_par", "ransac_plane_device",
    "ransac_line_serial", "ransac_line_par", "ransac_line_device",
]


@dataclasses.dataclass
class Plane:
    """ax + by + cz + d = 0; ranking = inlier count (segmentation.rs:20-27)."""
    a: float
    b: float
    c: float
    d: float
    ranking: int = 0

    def distance(self, points: np.ndarray) -> np.ndarray:
        nrm = np.sqrt(self.a ** 2 + self.b ** 2 + self.c ** 2)
        return np.abs(points @ np.array([self.a, self.b, self.c])
                      + self.d) / nrm


@dataclasses.dataclass
class Line:
    """Line through two points; ranking = inlier count
    (segmentation.rs:12-17)."""
    first: np.ndarray
    second: np.ndarray
    ranking: int = 0

    def distance(self, points: np.ndarray) -> np.ndarray:
        d = self.second - self.first
        rel = self.first[None, :] - points
        return np.linalg.norm(np.cross(np.broadcast_to(d, rel.shape), rel),
                              axis=1) / np.linalg.norm(d)


def _positions(buffer) -> np.ndarray:
    if isinstance(buffer, PointBatch):
        n = int(np.asarray(buffer.count))
        return np.asarray(buffer.data[att.POSITION_3D.name])[:n].astype(
            np.float64)
    return buffer.get_converted(att.POSITION_3D)


def _distinct_indices(rng, n: int, k: int) -> np.ndarray:
    return rng.choice(n, size=k, replace=False)


# ---- host variants -------------------------------------------------------------

def ransac_plane_serial(buffer, distance_threshold: float,
                        num_of_iterations: int, seed: int = 0
                        ) -> Tuple[Plane, np.ndarray]:
    """Best plane + inlier indices (reference ransac_plane_serial,
    segmentation.rs:239-255; inlier loop vectorised over points)."""
    pos = _positions(buffer)
    n = len(pos)
    if n < 3:
        raise ValueError("need at least 3 points for a plane")
    rng = np.random.default_rng(seed)
    best: Tuple[Plane, np.ndarray] = None
    for _ in range(num_of_iterations):
        i, j, k = _distinct_indices(rng, n, 3)
        normal = np.cross(pos[j] - pos[i], pos[k] - pos[i])
        d = -normal @ pos[i]
        plane = Plane(normal[0], normal[1], normal[2], d)
        dist = plane.distance(pos)
        inliers = np.flatnonzero(dist < distance_threshold)
        plane.ranking = len(inliers)
        if best is None or plane.ranking > best[0].ranking:
            best = (plane, inliers)
    return best


#: The reference's `_par` fans iterations over rayon (segmentation.rs:180-197);
#: the numpy loop is already vectorised over points, so par == serial here.
ransac_plane_par = ransac_plane_serial


def ransac_line_serial(buffer, distance_threshold: float,
                       num_of_iterations: int, seed: int = 0
                       ) -> Tuple[Line, np.ndarray]:
    """RANSAC line fit: returns the best :class:`Line` and its inlier
    indices after ``num_of_iterations`` two-point hypotheses (reference
    ``line_ransac_serial``, segmentation.rs; distances vectorised over
    the whole cloud per hypothesis)."""
    pos = _positions(buffer)
    n = len(pos)
    if n < 2:
        raise ValueError("need at least 2 points for a line")
    rng = np.random.default_rng(seed)
    best: Tuple[Line, np.ndarray] = None
    for _ in range(num_of_iterations):
        i, j = _distinct_indices(rng, n, 2)
        line = Line(pos[i], pos[j])
        dist = line.distance(pos)
        inliers = np.flatnonzero(dist < distance_threshold)
        line.ranking = len(inliers)
        if best is None or line.ranking > best[0].ranking:
            best = (line, inliers)
    return best


#: Parallel-hypothesis alias of :func:`ransac_line_serial` (the
#: reference's rayon variant, las_ransac.rs; the numpy implementation is
#: already vectorised over hypotheses, so both names share one function).
ransac_line_par = ransac_line_serial


# ---- device variants -----------------------------------------------------------

def _sample_distinct(key, iters: int, n: int, k: int) -> jnp.ndarray:
    """(iters, k) random indices, de-collided by deterministic nudging
    (the reference re-rolls in a loop, segmentation.rs:46-96; a nudge keeps
    the distribution near-uniform without data-dependent control flow)."""
    idx = jax.random.randint(key, (iters, k), 0, n)
    for col in range(1, k):
        for prev in range(col):
            clash = idx[:, col] == idx[:, prev]
            idx = idx.at[:, col].set(
                jnp.where(clash, (idx[:, col] + prev + 1) % n, idx[:, col]))
    return idx


_HYPO_CHUNK = 128  # hypotheses per chunk: bounds the (N, chunk) dist matrix


def _ransac_device(pos: jnp.ndarray, mask: jnp.ndarray, k: int,
                   distance_threshold, num_iterations: int, key):
    n = pos.shape[0]
    nvalid = jnp.maximum(jnp.sum(mask.astype(jnp.int32)), k)
    iters = -(-num_iterations // _HYPO_CHUNK) * _HYPO_CHUNK
    idx = _sample_distinct(key, iters, nvalid, k)
    samples = pos[idx]                       # (iters, k, 3)

    def score_chunk(chunk):                  # (chunk, k, 3) -> counts
        if k == 3:
            normal = jnp.cross(chunk[:, 1] - chunk[:, 0],
                               chunk[:, 2] - chunk[:, 0])   # (c, 3)
            dcoef = -jnp.sum(normal * chunk[:, 0], axis=1)
            nrm = jnp.linalg.norm(normal, axis=1, keepdims=True)
            # distances: |P @ n^T + d| / |n| — an MXU matmul per chunk
            dist = jnp.abs(jnp.matmul(
                pos, normal.T,
                precision=jax.lax.Precision.HIGHEST) + dcoef[None, :]) / \
                jnp.maximum(nrm.T, 1e-30)
        else:
            dvec = chunk[:, 1] - chunk[:, 0]
            rel = chunk[:, 0][None, :, :] - pos[:, None, :]  # (N, c, 3)
            cr = jnp.cross(jnp.broadcast_to(dvec[None], rel.shape), rel)
            dist = jnp.linalg.norm(cr, axis=-1) / jnp.maximum(
                jnp.linalg.norm(dvec, axis=-1)[None, :], 1e-30)
        inlier = (dist < distance_threshold) & mask[:, None]
        return jnp.sum(inlier.astype(jnp.int32), axis=0)

    # chunk hypotheses so the distance matrix stays (N, _HYPO_CHUNK)
    chunked = samples.reshape(-1, _HYPO_CHUNK, k, 3)
    counts = jax.lax.map(score_chunk, chunked).reshape(-1)   # (iters,)
    best = jnp.argmax(counts)
    best_sample = samples[best]

    # recompute the winning hypothesis' inlier mask
    if k == 3:
        normal = jnp.cross(best_sample[1] - best_sample[0],
                           best_sample[2] - best_sample[0])
        d = -normal @ best_sample[0]
        dist = jnp.abs(pos @ normal + d) / jnp.maximum(
            jnp.linalg.norm(normal), 1e-30)
    else:
        dvec = best_sample[1] - best_sample[0]
        rel = best_sample[0][None, :] - pos
        cr = jnp.cross(jnp.broadcast_to(dvec[None], rel.shape), rel)
        dist = jnp.linalg.norm(cr, axis=-1) / jnp.maximum(
            jnp.linalg.norm(dvec), 1e-30)
    inlier_best = (dist < distance_threshold) & mask
    return best_sample, counts[best], inlier_best


def ransac_plane_device(batch: PointBatch, distance_threshold: float,
                        num_of_iterations: int, seed: int = 0
                        ) -> Tuple[Plane, np.ndarray]:
    """Device RANSAC plane; returns (Plane, inlier indices).  The whole
    hypothesis batch is scored with one (N, iters) distance matmul."""
    pos = batch.data[att.POSITION_3D.name]
    key = jax.random.PRNGKey(seed)
    samples, count, inlier_mask = jax.jit(
        _ransac_device, static_argnums=(2, 4))(
        pos, batch.valid_mask(), 3, distance_threshold, num_of_iterations, key)
    s = np.asarray(samples, np.float64)
    normal = np.cross(s[1] - s[0], s[2] - s[0])
    plane = Plane(normal[0], normal[1], normal[2], -normal @ s[0],
                  int(count))
    return plane, np.flatnonzero(np.asarray(inlier_mask))


def ransac_line_device(batch: PointBatch, distance_threshold: float,
                       num_of_iterations: int, seed: int = 0
                       ) -> Tuple[Line, np.ndarray]:
    """Device RANSAC line fit: every hypothesis is scored in one vmapped
    batch on chip and the winner selected by argmax — the TPU replacement
    for the reference's rayon fan-out (segmentation.rs:180-197)."""
    pos = batch.data[att.POSITION_3D.name]
    key = jax.random.PRNGKey(seed)
    samples, count, inlier_mask = jax.jit(
        _ransac_device, static_argnums=(2, 4))(
        pos, batch.valid_mask(), 2, distance_threshold, num_of_iterations, key)
    s = np.asarray(samples, np.float64)
    line = Line(s[0], s[1], int(count))
    return line, np.flatnonzero(np.asarray(inlier_mask))

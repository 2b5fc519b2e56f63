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

__all__ = ["icp", "IcpResult", "nearest_neighbors", "morton_nearest_target"]


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
        # precision=HIGHEST: bf16 matmul inputs would swamp d2 at
        # survey coordinates (see normals._knn_tile)
        d2 = q2 + p2 - 2.0 * jnp.matmul(qt, points.T,
                                        precision=jax.lax.Precision.HIGHEST)
        d2 = jnp.where(points_valid[None, :], d2, big)
        idx = jnp.argmin(d2, axis=1)
        return idx.astype(jnp.int32), jnp.take_along_axis(
            d2, idx[:, None], axis=1)[:, 0]

    idx, d2 = jax.lax.map(one_tile, q)
    return idx.reshape(-1)[:n], d2.reshape(-1)[:n]


def morton_nearest_target(moved: jnp.ndarray, source_valid: jnp.ndarray,
                          target: jnp.ndarray, target_valid: jnp.ndarray,
                          bounds_min: jnp.ndarray, extent: jnp.ndarray,
                          window: int,
                          target_normals: Optional[jnp.ndarray] = None):
    """Approximate nearest-target of each source point in O((N+M)·window).

    The brute-force matmul correspondence is O(N·M) — prohibitive beyond
    ~100k-point maps.  This path co-sorts BOTH clouds on one Morton curve
    (isotropic 20-bit grid anchored at ``bounds_min``/``extent``) and, for
    each source row, takes the best TARGET row within ±``window`` ranks —
    running-min over static shifts, so there is not a single gather, and
    the matched positions ride a second sort back to source order.

    Returns ``(matched_positions (N, 3), sq_distances (N,))``; with
    ``target_normals`` the matched target's normal rides the same sorts
    and running-min (the point-to-plane path; parallel/distributed.py
    ships halo normals the same way) and a third element
    ``matched_normals (N, 3)`` is returned.  A source point whose true
    nearest target falls outside the window gets a farther match
    (weighted down or rejected by the caller's max-correspondence gate)
    — same locality contract as the window normals and the ring-halo
    distributed paths.
    """
    from ..math.morton import morton_encode_dual32

    n, m = moved.shape[0], target.shape[0]
    dtype = moved.dtype
    big = jnp.asarray(jnp.inf, dtype)
    inval = jnp.uint32(0xFFFFFFFF)
    with_normals = target_normals is not None

    pos = jnp.concatenate([moved, target])
    valid = jnp.concatenate([source_valid, target_valid])
    is_src = jnp.concatenate([jnp.ones(n, bool), jnp.zeros(m, bool)])
    # source rows carry their row id; target rows an out-of-range id that
    # sorts them behind every source row in the un-sort
    idx = jnp.concatenate([jnp.arange(n, dtype=jnp.uint32),
                           jnp.full((m,), jnp.uint32(0x7FFFFFFF))])

    iso = jnp.maximum(jnp.max(extent), 1e-9)
    cell = jnp.clip((pos - bounds_min[None, :]) / iso * (1 << 20),
                    0, (1 << 20) - 1).astype(jnp.uint32)
    hi, lo = morton_encode_dual32(cell[:, 0], cell[:, 1], cell[:, 2])
    hi = jnp.where(valid, hi, inval)
    lo = jnp.where(valid, lo, inval)
    flag = is_src.astype(jnp.uint32)
    ops = (hi, lo, flag, idx, pos[:, 0], pos[:, 1], pos[:, 2])
    if with_normals:
        nrm_full = jnp.concatenate(
            [jnp.zeros((n, 3), dtype), target_normals.astype(dtype)])
        ops = ops + (nrm_full[:, 0], nrm_full[:, 1], nrm_full[:, 2])
    sorted_ops = jax.lax.sort(ops, num_keys=2, is_stable=False)
    shi, _, sflag, sidx, sx, sy, sz = sorted_ops[:7]
    sp = jnp.stack([sx, sy, sz], axis=1)
    svalid = shi != inval
    cand_ok = svalid & (sflag == 0)          # valid TARGET rows only
    cp = jnp.where(cand_ok[:, None], sp, jnp.inf)

    w = window
    pad = jnp.full((w, 3), jnp.inf, dtype)
    cpp = jnp.concatenate([pad, cp, pad])
    if with_normals:
        sn = jnp.stack(sorted_ops[7:10], axis=1)
        cnn = jnp.concatenate([jnp.zeros((w, 3), dtype),
                               jnp.where(cand_ok[:, None], sn, 0.0),
                               jnp.zeros((w, 3), dtype)])

    bestd2 = jnp.full((n + m,), big)
    bpos = jnp.zeros((n + m, 3), dtype)
    bnrm = jnp.zeros((n + m, 3), dtype)
    for s in range(-w, w + 1):
        q = jax.lax.dynamic_slice_in_dim(cpp, w + s, n + m, axis=0)
        d = sp - q
        d2 = jnp.sum(d * d, axis=1)
        d2 = jnp.where(jnp.isfinite(d2), d2, big)
        better = d2 < bestd2
        bestd2 = jnp.where(better, d2, bestd2)
        bpos = jnp.where(better[:, None], q, bpos)
        if with_normals:
            qn = jax.lax.dynamic_slice_in_dim(cnn, w + s, n + m, axis=0)
            bnrm = jnp.where(better[:, None], qn, bnrm)

    # back to source order: target rows' huge ids sort behind all sources
    unsort = (sidx, bestd2, bpos[:, 0], bpos[:, 1], bpos[:, 2])
    if with_normals:
        unsort = unsort + (bnrm[:, 0], bnrm[:, 1], bnrm[:, 2])
    out = jax.lax.sort(unsort, num_keys=1, is_stable=False)
    _, d2o, bx, by, bz = out[:5]
    matched = jnp.stack([bx[:n], by[:n], bz[:n]], axis=1)
    if with_normals:
        mn = jnp.stack([out[5][:n], out[6][:n], out[7][:n]], axis=1)
        return matched, d2o[:n], mn
    return matched, d2o[:n]


def _solve_gn(h: jnp.ndarray, b: jnp.ndarray, damping: float) -> jnp.ndarray:
    h = h + damping * jnp.eye(6, dtype=h.dtype)
    l = jnp.linalg.cholesky(h)
    y = jax.scipy.linalg.solve_triangular(l, b, lower=True)
    return jax.scipy.linalg.solve_triangular(l.T, y, lower=False)


def _icp_step(source, source_valid, corr_fn,
              rot, t, max_dist_sq, point_to_plane, damping):
    moved = transform_points(rot, t, source)
    matched, d2, nrm = corr_fn(moved)
    w = (source_valid & (d2 < max_dist_sq)).astype(source.dtype)

    if point_to_plane:
        r = jnp.sum((moved - matched) * nrm, axis=1)           # (N,)
        # J_i = [n_i^T, (p_i x n_i)^T] for twist [rho, phi]
        j = jnp.concatenate([nrm, jnp.cross(moved, nrm)], axis=1)  # (N, 6)
        h = jnp.einsum("ni,nj,n->ij", j, j, w,
                       precision=jax.lax.Precision.HIGHEST)
        b = jnp.einsum("ni,n,n->i", j, r, w,
                       precision=jax.lax.Precision.HIGHEST)
    else:
        r = moved - matched                                     # (N, 3)
        # J_i = [I, -[p]_x] per residual row
        eye = jnp.broadcast_to(jnp.eye(3, dtype=source.dtype),
                               (moved.shape[0], 3, 3))
        j = jnp.concatenate([eye, -skew(moved)], axis=2)        # (N, 3, 6)
        h = jnp.einsum("nai,naj,n->ij", j, j, w,
                       precision=jax.lax.Precision.HIGHEST)
        b = jnp.einsum("nai,na,n->i", j, r, w,
                       precision=jax.lax.Precision.HIGHEST)

    xi = -_solve_gn(h, b, damping)
    d_rot, d_t = se3_exp(xi)
    new_rot = d_rot @ rot
    new_t = (d_rot @ t[:, None])[:, 0] + d_t

    nin = jnp.sum(w)
    rmse = jnp.sqrt(jnp.sum(jnp.where(w > 0, d2, 0.0) * w)
                    / jnp.maximum(nin, 1.0))
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
        damping: float = 1e-6,
        correspondence: str = "exact",
        window: int = 64) -> IcpResult:
    """Align ``source`` (N, 3) to ``target`` (M, 3).

    Runs ``iterations`` Gauss-Newton steps inside a ``lax.scan`` (static
    shape, single compilation).  ``*_valid`` mask padded rows.

    ``correspondence``: ``"exact"`` — brute-force MXU nearest neighbour,
    O(N·M) per iteration (right up to ~100k-point maps); ``"morton"`` —
    Morton-window matching, O((N+M)·window) per iteration
    (:func:`morton_nearest_target`), the multi-million-point path.
    Point-to-plane composes with both: on the morton path target normals
    default to the scalable Morton-window fit
    (algorithms.normals._morton_window_normals) and the matched normal
    rides the correspondence sorts — the same construction the
    partitioned distributed path uses (parallel/distributed.py).

    Example — recover a known 5cm shift:

    >>> import numpy as np, jax.numpy as jnp
    >>> from pasture_tpu.registration import icp
    >>> rng = np.random.default_rng(0)
    >>> target = jnp.asarray(rng.uniform(0, 5, (256, 3)), jnp.float32)
    >>> source = target + jnp.asarray([0.05, 0.0, -0.05], jnp.float32)
    >>> result = icp(source, target, max_correspondence_distance=1.0,
    ...              iterations=10)
    >>> bool(np.allclose(np.asarray(result.translation),
    ...                  [-0.05, 0.0, 0.05], atol=1e-3))
    True
    """
    dtype = source.dtype
    if source_valid is None:
        source_valid = jnp.ones(source.shape[0], bool)
    if target_valid is None:
        target_valid = jnp.ones(target.shape[0], bool)
    if correspondence not in ("exact", "morton"):
        raise ValueError(f"unknown correspondence {correspondence!r}")
    # registration math must not round matmul inputs to bf16 (the TPU
    # MXU default): rotation products and normal equations are
    # precision-critical and tiny, so HIGHEST costs nothing
    with jax.default_matmul_precision("highest"):
        return _icp_impl(source, target, source_valid, target_valid,
                         init_rotation, init_translation,
                         max_correspondence_distance, iterations,
                         point_to_plane, target_normals, tile, damping,
                         correspondence, window, dtype)


def _icp_impl(source, target, source_valid, target_valid, init_rotation,
              init_translation, max_correspondence_distance, iterations,
              point_to_plane, target_normals, tile, damping,
              correspondence, window, dtype):
    rot0 = jnp.eye(3, dtype=dtype) if init_rotation is None \
        else init_rotation.astype(dtype)
    t0 = jnp.zeros(3, dtype) if init_translation is None \
        else init_translation.astype(dtype)
    if point_to_plane:
        if target_normals is None:
            if correspondence == "morton":
                from ..algorithms.normals import _morton_window_normals
                target_normals, _ = _morton_window_normals(
                    target, target_valid, 10, max(window, 32))
            else:
                from ..algorithms.normals import _normals_device
                target_normals, _ = _normals_device(target, target_valid,
                                                    16, tile)
        target_normals = target_normals.astype(dtype)
    else:
        target_normals = jnp.zeros_like(target)

    max_d2 = jnp.asarray(max_correspondence_distance ** 2, dtype)

    if correspondence == "exact":
        def corr_fn(moved):
            idx, d2 = nearest_neighbors(moved, target, target_valid, tile)
            return target[idx], d2, target_normals[idx]
    else:
        big = jnp.asarray(jnp.inf, dtype)
        tmin = jnp.min(jnp.where(target_valid[:, None], target, big),
                       axis=0)
        tmax = jnp.max(jnp.where(target_valid[:, None], target, -big),
                       axis=0)
        extent = tmax - tmin
        zero_n = jnp.zeros((source.shape[0], 3), dtype)

        def corr_fn(moved):
            if point_to_plane:
                return morton_nearest_target(
                    moved, source_valid, target, target_valid, tmin,
                    extent, window, target_normals=target_normals)
            matched, d2 = morton_nearest_target(
                moved, source_valid, target, target_valid, tmin, extent,
                window)
            return matched, d2, zero_n

    def body(carry, _):
        rot, t = carry
        new_rot, new_t, rmse, nin = _icp_step(
            source, source_valid, corr_fn,
            rot, t, max_d2, point_to_plane, damping)
        return (new_rot, new_t), (rmse, nin)

    (rot, t), (rmses, nins) = jax.lax.scan(
        body, (rot0, t0), None, length=iterations)
    return IcpResult(rot, t, rmses[-1], nins[-1].astype(jnp.int32),
                     iterations)

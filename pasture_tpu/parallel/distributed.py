"""Distributed registration: sharded ICP and pose-graph solves.

Both follow the same collective recipe (the Schur-style reduce-then-solve
from BASELINE.json's north star): every device builds the *partial* normal
equations for its shard of the data, one ``psum`` reduces the 6x6 (ICP) or
6Nx6N (pose graph) system over the mesh, and the tiny solve runs replicated
on every device — no parameter server, no point data ever crossing the
interconnect, only curvature/gradient statistics ride ICI.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..buffers.device import PointBatch
from ..layout import attributes as att
from ..registration.icp import IcpResult, nearest_neighbors, _solve_gn
from ..registration.pose_graph import (PoseGraph, _edge_blocks,
                                       build_normal_equations)
from ..registration.se3 import se3_exp, skew, transform_points
from .halo import halo_exchange_local
from .mesh import POINTS_AXIS
from .partition import morton_partition

__all__ = ["distributed_icp", "distributed_icp_partitioned",
           "distributed_pose_graph"]




def _highest_precision(fn):
    """Registration math must not round matmul inputs to bf16 (TPU MXU
    default) — see registration/icp.py."""
    import functools

    @functools.wraps(fn)
    def wrapped(*a, **k):
        with jax.default_matmul_precision("highest"):
            return fn(*a, **k)
    return wrapped


@_highest_precision
def distributed_icp(source: jnp.ndarray, target: jnp.ndarray, mesh: Mesh,
                    source_count: Optional[jnp.ndarray] = None,
                    axis: str = POINTS_AXIS,
                    max_correspondence_distance: float = 1.0,
                    iterations: int = 20,
                    damping: float = 1e-6,
                    tile: int = 2048) -> IcpResult:
    """Point-to-point ICP with the source sharded over the mesh.

    ``source`` (N, 3) shards over ``axis`` (N divisible by the axis size);
    ``target`` (M, 3) replicates (scan-to-map: the map block is resident on
    every device of the group).  Each iteration: per-shard correspondences
    + partial H/b, ``psum``, replicated 6x6 solve.
    """
    n = source.shape[0]
    n_shards = mesh.shape[axis]
    assert n % n_shards == 0, "pad source to a multiple of the axis size"
    if source_count is None:
        source_count = jnp.asarray(n, jnp.int32)
    dtype = source.dtype
    max_d2 = jnp.asarray(max_correspondence_distance ** 2, dtype)
    per = n // n_shards
    target_valid = jnp.ones(target.shape[0], bool)

    def shard_fn(src, count):
        idx = jax.lax.axis_index(axis)
        offset = idx.astype(jnp.int32) * per
        local_count = jnp.clip(count - offset, 0, per)
        valid = jnp.arange(per, dtype=jnp.int32) < local_count

        def body(carry, _):
            rot, t = carry
            moved = transform_points(rot, t, src)
            nn_idx, d2 = nearest_neighbors(moved, target, target_valid, tile)
            w = (valid & (d2 < max_d2)).astype(dtype)
            r = moved - target[nn_idx]
            eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (per, 3, 3))
            j = jnp.concatenate([eye, -skew(moved)], axis=2)
            h = jnp.einsum("nai,naj,n->ij", j, j, w,
                           precision=jax.lax.Precision.HIGHEST)
            b = jnp.einsum("nai,na,n->i", j, r, w,
                           precision=jax.lax.Precision.HIGHEST)
            # THE collective: reduce curvature + gradient over the mesh
            h = jax.lax.psum(h, axis)
            b = jax.lax.psum(b, axis)
            nin = jax.lax.psum(jnp.sum(w), axis)
            sse = jax.lax.psum(jnp.sum(d2 * w), axis)

            xi = -_solve_gn(h, b, damping)
            d_rot, d_t = se3_exp(xi)
            new_rot = d_rot @ rot
            new_t = (d_rot @ t[:, None])[:, 0] + d_t
            rmse = jnp.sqrt(sse / jnp.maximum(nin, 1.0))
            return (new_rot, new_t), (rmse, nin)

        (rot, t), (rmses, nins) = jax.lax.scan(
            body, (jnp.eye(3, dtype=dtype), jnp.zeros(3, dtype)), None,
            length=iterations)
        return rot, t, rmses[-1], nins[-1]

    rot, t, rmse, nin = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis, None), P()),
        out_specs=(P(), P(), P(), P()))(source, source_count)
    return IcpResult(rot, t, rmse, nin.astype(jnp.int32), iterations)


@_highest_precision
def distributed_icp_partitioned(
        source: PointBatch, target: PointBatch, mesh: Mesh,
        axis: str = POINTS_AXIS,
        halo: int = 512,
        capacity_factor: float = 2.0,
        max_correspondence_distance: float = 1.0,
        iterations: int = 20,
        damping: float = 1e-6,
        tile: int = 2048,
        point_to_plane: bool = False,
        normals_k: int = 10,
        normals_window: int = 32) -> Tuple[IcpResult, jnp.ndarray]:
    """Scan-to-map ICP with BOTH clouds Morton-partitioned over the mesh.

    Unlike :func:`distributed_icp` (replicated target), the target map is
    partitioned: device ``d`` owns the ``d``-th contiguous Morton block of
    the map and only its own block's points are resident.  The source scan
    is co-partitioned with the map's splitters
    (:class:`~pasture_tpu.parallel.partition.MortonPartitionSpec`), so each
    device matches its local scan block against its local map block plus a
    ``halo``-row boundary exchange with its ring neighbours
    (:func:`~pasture_tpu.parallel.halo.halo_exchange_local`) — point data
    never rides the interconnect beyond the boundary slabs; per iteration
    only the 6x6 H / 6-vector b statistics are ``psum``-reduced.

    Correctness domain: a correspondence is found iff the true nearest
    map point lies in the local block or the ±``halo`` boundary rows of
    the ring neighbours.  Choose ``halo`` ≥ the number of map points
    within ``max_correspondence_distance`` of a block boundary (Morton
    blocks are contiguous along the curve, so boundary neighbourhoods are
    ring-local for smooth clouds); the initial pose error must also stay
    within the halo margin, as partitioning happens once, up front.

    ``point_to_plane``: minimise the along-normal residual instead of the
    full point distance.  Target normals are fitted PER SHARD on the
    sorted local map block padded with ring-halo boundary rows (the
    zero-gather window fit of
    :func:`pasture_tpu.algorithms.normals.window_fit`, ``normals_k`` /
    ``normals_window``), and the correspondence halo ships each boundary
    row's home-shard normal alongside its position — the complete
    production scan-to-map path with nothing replicated.

    Returns ``(IcpResult, dropped)`` where ``dropped`` is the summed
    overflow count of both partitioning steps — callers must check it is
    zero (raise ``capacity_factor`` otherwise).
    """
    from ..algorithms.normals import window_fit
    pos_name = att.POSITION_3D.name

    def pos_only(b: PointBatch) -> PointBatch:
        return PointBatch({pos_name: b.data[pos_name]}, b.count,
                          b.schema, {})

    tgt_p, tgt_counts, tgt_drop, spec = morton_partition(
        pos_only(target), mesh, axis, capacity_factor, return_spec=True,
        sort_local=True)
    src_p, src_counts, src_drop = morton_partition(
        pos_only(source), mesh, axis, capacity_factor, spec=spec)
    dropped = jnp.sum(tgt_drop) + jnp.sum(src_drop)

    n_shards = mesh.shape[axis]
    dtype = source.data[pos_name].dtype
    max_d2 = jnp.asarray(max_correspondence_distance ** 2, dtype)
    src_cap = src_p.capacity // n_shards

    def shard_fn(src, s_cnt, tgt, t_cnt):
        s_valid = jnp.arange(src.shape[0], dtype=jnp.int32) < s_cnt[0]
        t_valid = jnp.arange(tgt.shape[0], dtype=jnp.int32) < t_cnt[0]

        if point_to_plane:
            # per-shard target normals: sorted local block + ring-halo
            # rows as the window padding (same fit as distributed_normals)
            wn = normals_window
            npad_cols, npad_counts = halo_exchange_local(
                {pos_name: tgt}, t_cnt[0], n_shards, wn, axis)
            nidx = jnp.arange(wn, dtype=jnp.int32)
            nleft = jnp.where((nidx < npad_counts[0])[:, None],
                              npad_cols[pos_name][:wn], jnp.inf)
            nright = jnp.where((nidx < npad_counts[1])[:, None],
                               npad_cols[pos_name][wn:], jnp.inf)
            sp = jnp.where(t_valid[:, None], tgt, jnp.inf)
            pp = jnp.concatenate([nleft, sp, nright]).astype(dtype)
            tgt_normals, _, _ = window_fit(sp.astype(dtype), pp,
                                           normals_k, wn)
        else:
            tgt_normals = jnp.zeros_like(tgt)

        # ring exchange of the map block's boundary slabs — positions AND
        # their home-shard normals — the rows this shard's
        # correspondences may need beyond its own block
        halo_cols, halo_counts = halo_exchange_local(
            {pos_name: tgt, "normal": tgt_normals}, t_cnt[0], n_shards,
            halo, axis)
        hidx = jnp.arange(halo, dtype=jnp.int32)
        h_valid = jnp.concatenate([hidx < halo_counts[0],
                                   hidx < halo_counts[1]])
        full_t = jnp.concatenate([tgt, halo_cols[pos_name]], axis=0)
        full_n = jnp.concatenate([tgt_normals, halo_cols["normal"]],
                                 axis=0)
        full_valid = jnp.concatenate([t_valid, h_valid])

        def body(carry, _):
            rot, t = carry
            moved = transform_points(rot, t, src)
            nn_idx, d2 = nearest_neighbors(moved, full_t, full_valid, tile)
            w = (s_valid & (d2 < max_d2)).astype(dtype)
            d2c = jnp.where(w > 0, d2, 0.0)  # empty shards: d2 == inf
            matched = full_t[nn_idx]
            if point_to_plane:
                nrm = full_n[nn_idx]
                rr = jnp.sum(jnp.where(w[:, None] > 0, moved - matched,
                                       0.0) * nrm, axis=1)       # (N,)
                j = jnp.concatenate([nrm, jnp.cross(moved, nrm)],
                                    axis=1)                       # (N, 6)
                h = jnp.einsum("ni,nj,n->ij", j, jnp.where(
                    w[:, None] > 0, j, 0.0), w,
                    precision=jax.lax.Precision.HIGHEST)
                b = jnp.einsum("ni,n,n->i", j, rr, w,
                               precision=jax.lax.Precision.HIGHEST)
            else:
                r = moved - matched
                eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype),
                                       (src.shape[0], 3, 3))
                j = jnp.concatenate([eye, -skew(moved)], axis=2)
                h = jnp.einsum("nai,naj,n->ij", j, jnp.where(
                    w[:, None, None] > 0, j, 0.0), w,
                    precision=jax.lax.Precision.HIGHEST)
                b = jnp.einsum("nai,na,n->i", j, jnp.where(
                    w[:, None] > 0, r, 0.0), w,
                    precision=jax.lax.Precision.HIGHEST)
            h = jax.lax.psum(h, axis)
            b = jax.lax.psum(b, axis)
            nin = jax.lax.psum(jnp.sum(w), axis)
            sse = jax.lax.psum(jnp.sum(d2c * w), axis)

            xi = -_solve_gn(h, b, damping)
            d_rot, d_t = se3_exp(xi)
            new_rot = d_rot @ rot
            new_t = (d_rot @ t[:, None])[:, 0] + d_t
            rmse = jnp.sqrt(sse / jnp.maximum(nin, 1.0))
            return (new_rot, new_t), (rmse, nin)

        (rot, t), (rmses, nins) = jax.lax.scan(
            body, (jnp.eye(3, dtype=dtype), jnp.zeros(3, dtype)), None,
            length=iterations)
        return rot, t, rmses[-1], nins[-1]

    rot, t, rmse, nin = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis, None), P(axis), P(axis, None), P(axis)),
        out_specs=(P(), P(), P(), P()),
        check_vma=False)(
        src_p.data[pos_name], src_counts.astype(jnp.int32),
        tgt_p.data[pos_name], tgt_counts.astype(jnp.int32))
    return IcpResult(rot, t, rmse, nin.astype(jnp.int32),
                     iterations), dropped


@_highest_precision
def distributed_pose_graph(graph: PoseGraph, mesh: Mesh,
                           axis: str = POINTS_AXIS,
                           iterations: int = 10,
                           damping: float = 1e-6,
                           anchor_weight: float = 1e8,
                           solver: str = "dense",
                           cg_iterations: int = 500,
                           cg_tol: float = 1e-8
                           ) -> Tuple[PoseGraph, jnp.ndarray]:
    """Pose-graph Gauss-Newton with the *edge set* sharded over the mesh.

    Poses replicate (6N parameters are tiny); each device assembles the
    partial H/b for its edge shard.  ``solver="dense"``: ``psum`` reduces
    the full (6N, 6N) H and the Cholesky runs replicated — right to ~2k
    poses.  ``solver="cg"``: block-sparse PCG where each device applies
    only ITS edge shard's off-diagonal blocks per H·x product and a (N, 6)
    ``psum`` reduces — O(E/devices) memory per device, the ≥10k-pose path
    (same solver as registration.optimize_pose_graph(solver="cg"), with
    the edge loop distributed).  Edge count must divide the axis size (pad
    with zero-weight self-edges ``(0, 0)`` if needed).
    """
    if solver not in ("dense", "cg"):
        raise ValueError(f"unknown solver {solver!r}")
    n = graph.num_poses
    e = graph.num_edges
    n_shards = mesh.shape[axis]
    dtype = graph.translations.dtype
    weights = (graph.weights if graph.weights is not None
               else jnp.ones(e, dtype))
    pad = (-e) % n_shards
    if pad:
        zeros2 = jnp.zeros((pad, 2), jnp.int32)
        edges = jnp.concatenate([graph.edges, zeros2])
        rel_r = jnp.concatenate([
            graph.rel_rotations,
            jnp.broadcast_to(jnp.eye(3, dtype=dtype), (pad, 3, 3))])
        rel_t = jnp.concatenate([graph.rel_translations,
                                 jnp.zeros((pad, 3), dtype)])
        weights = jnp.concatenate([weights, jnp.zeros(pad, dtype)])
    else:
        edges, rel_r, rel_t = (graph.edges, graph.rel_rotations,
                               graph.rel_translations)

    def _xi_dense(rotations, translations, edges_s, rel_r_s, rel_t_s, w_s):
        h, b = build_normal_equations(rotations, translations, edges_s,
                                      rel_r_s, rel_t_s, w_s)
        h = jax.lax.psum(h, axis)
        b = jax.lax.psum(b, axis)
        anchor = jnp.zeros(6 * n, dtype).at[:6].set(anchor_weight)
        h = h + jnp.diag(anchor) + damping * jnp.eye(6 * n, dtype=dtype)
        l = jnp.linalg.cholesky(h)
        y = jax.scipy.linalg.solve_triangular(l, -b, lower=True)
        xi = jax.scipy.linalg.solve_triangular(
            l.T, y, lower=False).reshape(n, 6)
        return xi, jnp.sum(b * b)

    def _xi_cg(rotations, translations, edges_s, rel_r_s, rel_t_s, w_s):
        # per-shard edge blocks; diag/b psum to replicated (N,6,...) —
        # H itself is never materialized anywhere
        r, ja, jb = _edge_blocks(rotations, translations, edges_s,
                                 rel_r_s, rel_t_s, w_s)
        w3 = w_s[:, None, None]
        i_idx, j_idx = edges_s[:, 0], edges_s[:, 1]
        diag = jnp.zeros((n, 6, 6), dtype)
        diag = diag.at[i_idx].add(w3 * jnp.einsum("eab,eac->ebc", ja, ja))
        diag = diag.at[j_idx].add(w3 * jnp.einsum("eab,eac->ebc", jb, jb))
        diag = jax.lax.psum(diag, axis)
        eye6 = jnp.eye(6, dtype=dtype)
        diag = diag + damping * eye6[None]
        diag = diag.at[0].add(anchor_weight * eye6)
        hij = w3 * jnp.einsum("eab,eac->ebc", ja, jb)
        hij_t = jnp.swapaxes(hij, 1, 2)
        b = jnp.zeros((n, 6), dtype)
        w1 = w_s[:, None]
        b = b.at[i_idx].add(w1 * jnp.einsum("eab,ea->eb", ja, r))
        b = b.at[j_idx].add(w1 * jnp.einsum("eab,ea->eb", jb, r))
        b = jax.lax.psum(b, axis)
        diag_chol = jnp.linalg.cholesky(diag)

        def apply_h(x):
            contrib = jnp.concatenate([
                jnp.einsum("eab,eb->ea", hij, x[j_idx]),
                jnp.einsum("eab,eb->ea", hij_t, x[i_idx])])
            rows = jnp.concatenate([i_idx, j_idx])
            y_edge = jnp.zeros((n, 6), dtype).at[rows].add(contrib)
            # THE collective: one (N, 6) reduce per CG iteration
            y_edge = jax.lax.psum(y_edge, axis)
            return jnp.einsum("nab,nb->na", diag, x) + y_edge

        def apply_minv(rr):
            return jax.scipy.linalg.cho_solve((diag_chol, True),
                                              rr[..., None])[..., 0]

        bb = -b
        x0 = jnp.zeros_like(bb)
        z0 = apply_minv(bb)
        rz0 = jnp.sum(bb * z0)
        tol2 = cg_tol * cg_tol * jnp.maximum(rz0, 1e-300)

        def cond(state):
            k, _, _, _, rz = state
            return (k < cg_iterations) & (rz > tol2)

        def step(state):
            k, x, rr, p, rz = state
            hp = apply_h(p)
            alpha = rz / jnp.maximum(jnp.sum(p * hp), 1e-300)
            x = x + alpha * p
            rr = rr - alpha * hp
            z = apply_minv(rr)
            rz_new = jnp.sum(rr * z)
            beta = rz_new / jnp.maximum(rz, 1e-300)
            p = z + beta * p
            return k + 1, x, rr, p, rz_new

        _, xi, _, _, _ = jax.lax.while_loop(
            cond, step, (jnp.asarray(0, jnp.int32), x0, bb, z0, rz0))
        return xi, jnp.sum(b * b)

    def shard_fn(edges_s, rel_r_s, rel_t_s, w_s, rot0, t0):
        xi_fn = _xi_dense if solver == "dense" else _xi_cg

        def body(carry, _):
            rotations, translations = carry
            xi, cost = xi_fn(rotations, translations, edges_s, rel_r_s,
                             rel_t_s, w_s)
            d_rot, d_t = se3_exp(xi)
            new_rot = d_rot @ rotations
            new_t = (d_rot @ translations[..., None])[..., 0] + d_t
            return (new_rot, new_t), cost

        (rot, t), costs = jax.lax.scan(body, (rot0, t0), None,
                                       length=iterations)
        return rot, t, costs

    rot, t, costs = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None, None), P(axis, None), P(axis),
                  P(), P()),
        out_specs=(P(), P(), P()))(
        edges, rel_r, rel_t, weights, graph.rotations, graph.translations)
    import dataclasses
    return dataclasses.replace(graph, rotations=rot, translations=t), costs

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

from ..registration.icp import IcpResult, nearest_neighbors, _solve_gn
from ..registration.pose_graph import PoseGraph, build_normal_equations
from ..registration.se3 import se3_exp, skew, transform_points
from .mesh import POINTS_AXIS

__all__ = ["distributed_icp", "distributed_pose_graph"]


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
            h = jnp.einsum("nai,naj,n->ij", j, j, w)
            b = jnp.einsum("nai,na,n->i", j, r, w)
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


def distributed_pose_graph(graph: PoseGraph, mesh: Mesh,
                           axis: str = POINTS_AXIS,
                           iterations: int = 10,
                           damping: float = 1e-6,
                           anchor_weight: float = 1e8
                           ) -> Tuple[PoseGraph, jnp.ndarray]:
    """Pose-graph Gauss-Newton with the *edge set* sharded over the mesh.

    Poses replicate (6N parameters are tiny); each device assembles the
    partial H/b for its edge shard; ``psum`` reduces; the dense 6Nx6N
    Cholesky runs replicated.  Edge count must divide the axis size (pad
    with zero-weight self-edges ``(0, 0)`` if needed).
    """
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

    def shard_fn(edges_s, rel_r_s, rel_t_s, w_s, rot0, t0):
        def body(carry, _):
            rotations, translations = carry
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
            d_rot, d_t = se3_exp(xi)
            new_rot = d_rot @ rotations
            new_t = (d_rot @ translations[..., None])[..., 0] + d_t
            cost = jnp.sum(b * b)
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

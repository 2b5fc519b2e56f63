"""SE(3)/SO(3) Lie group operations, jit/vmap/autodiff-friendly.

All functions are pure jax with static shapes: rotations as 3x3 matrices,
twists as 6-vectors ``[rho, phi]`` (translation first).  Small-angle cases
use Taylor guards AND autodiff-safe norms (``sqrt(x·x + tiny)``, atan2-based
rotation log) so forward-mode Jacobians at the identity — which the
pose-graph solver takes — stay finite.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

__all__ = ["so3_exp", "so3_log", "se3_exp", "se3_log", "skew",
           "transform_points"]

_EPS = 1e-8
_TINY = 1e-24


def _safe_norm(x: jnp.ndarray) -> jnp.ndarray:
    """Norm over the last axis with a finite gradient at 0."""
    return jnp.sqrt(jnp.sum(x * x, axis=-1) + _TINY)


def skew(w: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 3, 3) cross-product matrix."""
    z = jnp.zeros_like(w[..., 0])
    return jnp.stack([
        jnp.stack([z, -w[..., 2], w[..., 1]], axis=-1),
        jnp.stack([w[..., 2], z, -w[..., 0]], axis=-1),
        jnp.stack([-w[..., 1], w[..., 0], z], axis=-1),
    ], axis=-2)


def _sin_over_x(t):
    return jnp.where(jnp.abs(t) > _EPS,
                     jnp.sin(t) / jnp.where(jnp.abs(t) > _EPS, t, 1.0),
                     1.0 - t * t / 6.0)


def _one_minus_cos_over_x2(t):
    t2 = t * t
    return jnp.where(jnp.abs(t) > _EPS,
                     (1.0 - jnp.cos(t)) / jnp.where(t2 > _EPS * _EPS, t2, 1.0),
                     0.5 - t2 / 24.0)


def _x_minus_sin_over_x3(t):
    t2 = t * t
    t3 = t2 * t
    return jnp.where(jnp.abs(t) > _EPS,
                     (t - jnp.sin(t)) / jnp.where(jnp.abs(t3) > _EPS ** 3,
                                                  t3, 1.0),
                     1.0 / 6.0 - t2 / 120.0)


def so3_exp(phi: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: axis-angle (..., 3) -> rotation matrix (..., 3, 3)."""
    theta = _safe_norm(phi)[..., None, None]
    k = skew(phi)
    k2 = k @ k
    a = _sin_over_x(theta)
    b = _one_minus_cos_over_x2(theta)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), k.shape)
    return eye + a * k + b * k2


def so3_log(rot: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> axis-angle (..., 3).

    Uses ``atan2(|w|/2, (tr-1)/2)`` instead of arccos — differentiable at
    the identity (the arccos form has an infinite derivative there)."""
    w = jnp.stack([rot[..., 2, 1] - rot[..., 1, 2],
                   rot[..., 0, 2] - rot[..., 2, 0],
                   rot[..., 1, 0] - rot[..., 0, 1]], axis=-1)
    sin_theta = 0.5 * _safe_norm(w)
    cos_theta = 0.5 * (jnp.trace(rot, axis1=-2, axis2=-1) - 1.0)
    theta = jnp.arctan2(sin_theta, cos_theta)
    # w = 2 sin(theta) * axis  ->  phi = theta * axis = w * theta/(2 sin)
    scale = jnp.where(theta > _EPS,
                      theta / jnp.where(sin_theta > _EPS * 0.5,
                                        2.0 * sin_theta, 1.0),
                      0.5 + theta * theta / 12.0)
    return scale[..., None] * w


def se3_exp(xi: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Twist (..., 6) [rho, phi] -> (R (...,3,3), t (...,3))."""
    rho, phi = xi[..., :3], xi[..., 3:]
    rot = so3_exp(phi)
    theta = _safe_norm(phi)[..., None, None]
    k = skew(phi)
    k2 = k @ k
    b = _one_minus_cos_over_x2(theta)
    c = _x_minus_sin_over_x3(theta)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), k.shape)
    v = eye + b * k + c * k2
    t = (v @ rho[..., None])[..., 0]
    return rot, t


def se3_log(rot: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(R, t) -> twist (..., 6) [rho, phi]."""
    phi = so3_log(rot)
    theta = _safe_norm(phi)[..., None, None]
    k = skew(phi)
    k2 = k @ k
    t2 = theta * theta
    # V^{-1} = I - K/2 + (1/t^2 - (1+cos)/(2 t sin)) K^2
    sin_t = jnp.sin(theta)
    denom_ok = (theta > _EPS) & (jnp.abs(sin_t) > _EPS)
    cot_term = jnp.where(
        denom_ok,
        1.0 / jnp.where(t2 > _EPS * _EPS, t2, 1.0)
        - (1.0 + jnp.cos(theta)) / jnp.where(
            jnp.abs(2.0 * theta * sin_t) > _EPS * _EPS,
            2.0 * theta * sin_t, 1.0),
        1.0 / 12.0 + t2 / 720.0)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), k.shape)
    v_inv = eye - 0.5 * k + cot_term * k2
    rho = (v_inv @ t[..., None])[..., 0]
    return jnp.concatenate([rho, phi], axis=-1)


def transform_points(rot: jnp.ndarray, t: jnp.ndarray,
                     points: jnp.ndarray) -> jnp.ndarray:
    """Apply (R, t) to an (N, 3) column (MXU matmul)."""
    return points @ rot.T + t[None, :]

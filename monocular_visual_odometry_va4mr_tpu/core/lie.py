"""SO(3) / SE(3) operations in pure jax.numpy.

TPU-native replacement for the reference's rotation handling:
``cv2.Rodrigues`` (reference VisualOdometryPipeLine.py:354) and
``invert_transform`` (reference VisualOdometryPipeLine.py:62-77).

All functions are written for single elements with leading-dim-free shapes
((3,), (3,3), (4,4)) and are safe to ``jax.vmap``.  Everything is f32-friendly
and uses Taylor guards near the singularities so the ops are differentiable
(required by the bundle-adjustment back-end in ``backend/ba.py``).
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """so(3) hat operator: (3,) -> (3,3) skew-symmetric matrix."""
    wx, wy, wz = w[0], w[1], w[2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy]),
            jnp.stack([wz, z, -wx]),
            jnp.stack([-wy, wx, z]),
        ]
    )


def vee(W: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`hat`: (3,3) skew -> (3,)."""
    return jnp.stack([W[2, 1], W[0, 2], W[1, 0]])


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (3,) -> rotation matrix (3,3) (Rodrigues formula).

    Matches ``cv2.Rodrigues(rvec)`` (reference VisualOdometryPipeLine.py:354).
    Small-angle Taylor expansion keeps it finite and differentiable at 0.
    """
    theta2 = jnp.dot(w, w)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    W = hat(w)
    # sin(t)/t and (1-cos(t))/t^2 with Taylor guards.
    a = jnp.where(theta2 > _EPS, jnp.sin(theta) / theta, 1.0 - theta2 / 6.0)
    b = jnp.where(
        theta2 > _EPS, (1.0 - jnp.cos(theta)) / (theta2 + _EPS * _EPS), 0.5 - theta2 / 24.0
    )
    return jnp.eye(3, dtype=w.dtype) + a * W + b * (W @ W)


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (3,3) -> axis-angle (3,) (inverse Rodrigues).

    Numerically robust for angles near 0 and near pi, and differentiable
    (theta via arctan2 rather than arccos — arccos has an unbounded gradient
    at the identity, which poisoned autodiff Jacobians in the pose-graph
    back-end).
    """
    w_asym = vee(R - R.T) * 0.5  # = sin(theta) * axis
    # eps inside the sqrt keeps the norm's gradient finite at theta = 0.
    s = jnp.sqrt(jnp.sum(w_asym * w_asym) + _EPS * _EPS)
    c = jnp.clip((jnp.trace(R) - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arctan2(s, c)  # bounded gradients everywhere but (0, 0)
    # Generic branch: scale = theta / sin(theta), Taylor for small theta.
    # Safe denominator so the untaken where-branch can't produce NaN grads.
    s_safe = jnp.maximum(s, _EPS)
    scale = jnp.where(theta < 1e-4, 1.0 + theta * theta / 6.0, theta / s_safe)
    w_generic = w_asym * scale
    # Near-pi branch (s -> 0, c -> -1): axis from the largest column of R + I.
    B = R + jnp.eye(3, dtype=R.dtype)
    k = jnp.argmax(jnp.diagonal(B))
    col = B[:, k]
    axis = col / jnp.maximum(jnp.linalg.norm(col), _EPS)
    sign = jnp.where(jnp.dot(axis, w_asym) < 0.0, -1.0, 1.0)
    w_pi = sign * axis * theta
    return jnp.where(theta > jnp.pi - 1e-3, w_pi, w_generic)


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """se(3) twist (6,) = (v, w) -> homogeneous transform (4,4)."""
    v, w = xi[:3], xi[3:]
    theta2 = jnp.dot(w, w)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    W = hat(w)
    R = so3_exp(w)
    b = jnp.where(
        theta2 > _EPS, (1.0 - jnp.cos(theta)) / (theta2 + _EPS * _EPS), 0.5 - theta2 / 24.0
    )
    c = jnp.where(
        theta2 > _EPS,
        (theta - jnp.sin(theta)) / (theta2 * theta + _EPS * _EPS),
        1.0 / 6.0 - theta2 / 120.0,
    )
    V = jnp.eye(3, dtype=xi.dtype) + b * W + c * (W @ W)
    T = jnp.eye(4, dtype=xi.dtype)
    T = T.at[:3, :3].set(R)
    T = T.at[:3, 3].set(V @ v)
    return T


def se3_log(T: jnp.ndarray) -> jnp.ndarray:
    """Homogeneous transform (4,4) -> twist (6,) = (v, w)."""
    R = T[:3, :3]
    t = T[:3, 3]
    w = so3_log(R)
    theta2 = jnp.dot(w, w)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    W = hat(w)
    half_theta = 0.5 * theta
    # V^{-1} = I - W/2 + (1/theta^2)(1 - theta sin / (2 (1-cos))) W^2
    theta2_safe = jnp.maximum(theta2, _EPS)
    cot_term = jnp.where(
        theta2 > 1e-8,
        (1.0 - half_theta * jnp.cos(half_theta)
         / jnp.maximum(jnp.sin(half_theta), _EPS)) / theta2_safe,
        1.0 / 12.0 + theta2 / 720.0,
    )
    V_inv = jnp.eye(3, dtype=T.dtype) - 0.5 * W + cot_term * (W @ W)
    v = V_inv @ t
    return jnp.concatenate([v, w])


def rt_to_matrix(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(3,3), (3,) or (3,1) -> (4,4) homogeneous transform."""
    T = jnp.eye(4, dtype=R.dtype)
    T = T.at[:3, :3].set(R)
    T = T.at[:3, 3].set(t.reshape(3))
    return T


def matrix_to_rt(T: jnp.ndarray):
    return T[:3, :3], T[:3, 3]


def invert_rt(R: jnp.ndarray, t: jnp.ndarray):
    """Rigid-transform inverse ``(R, t) -> (R^T, -R^T t)``.

    TPU-native equivalent of the reference's ``invert_transform``
    (reference VisualOdometryPipeLine.py:62-77), used to flip between
    camera-from-world and world-from-camera conventions.
    """
    Rinv = R.T
    return Rinv, -(Rinv @ t)


def invert_se3(T: jnp.ndarray) -> jnp.ndarray:
    """Homogeneous (4,4) rigid-transform inverse."""
    R = T[:3, :3]
    t = T[:3, 3]
    Ti = jnp.eye(4, dtype=T.dtype)
    Ti = Ti.at[:3, :3].set(R.T)
    Ti = Ti.at[:3, 3].set(-(R.T @ t))
    return Ti

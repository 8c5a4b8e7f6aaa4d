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


# ---------------------------------------------------------------------------
# Sim(3) — similarity transforms [[s*R, t], [0, 1]].
#
# Used by the Sim(3) pose graph (backend/posegraph_sim3.py), the standard
# treatment of monocular SCALE drift (Strasdat et al., "Scale drift-aware
# large scale monocular SLAM"): a two-view loop closure constrains relative
# rotation/translation-direction AND relative scale, and optimizing nodes on
# Sim(3) redistributes accumulated scale error along the loop — something an
# SE(3) graph structurally cannot do.  Tangent layout: xi = (v, w, sigma),
# exp(xi) = [[e^sigma * so3_exp(w), W(w, sigma) v], [0, 1]] (Sophus
# convention).  All branches carry Taylor guards with safe denominators so
# jax.jacobian at xi = 0 (the pose-graph linearization point) is exact.
# ---------------------------------------------------------------------------


def _sim3_W(w: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """The (3,3) matrix W with t = W v in sim3_exp (Sophus calcW)."""
    dtype = w.dtype
    theta2 = jnp.dot(w, w)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    Om = hat(w)
    s = jnp.exp(sigma)
    sig2 = sigma * sigma

    small_sig = jnp.abs(sigma) < 1e-4
    small_th = theta < 1e-4
    sig_safe = jnp.where(small_sig, 1.0, sigma)
    sig2_safe = jnp.where(small_sig, 1.0, sig2)
    th_safe = jnp.where(small_th, 1.0, theta)
    th2_safe = jnp.where(small_th, 1.0, theta2)
    c_den = theta2 + sig2
    c_safe = jnp.where(c_den < 1e-10, 1.0, c_den)

    C = jnp.where(small_sig, 1.0 + sigma / 2.0 + sig2 / 6.0,
                  (s - 1.0) / sig_safe)

    a_ = s * jnp.sin(theta)
    b_ = s * jnp.cos(theta)
    A_gen = (a_ * sigma + (1.0 - b_) * theta) / (th_safe * c_safe)
    A_sig = ((sigma - 1.0) * s + 1.0) / sig2_safe  # sigma!=0, theta->0
    A_small = jnp.where(small_th, 0.5 + sigma / 3.0,
                        (1.0 - jnp.cos(theta)) / th2_safe)
    A = jnp.where(small_sig, A_small, jnp.where(small_th, A_sig, A_gen))

    B_gen = (C - ((b_ - 1.0) * sigma + a_ * theta) / c_safe) / th2_safe
    B_sig = (s * (0.5 * sig2 - sigma + 1.0) - 1.0) / (sig2_safe * sig_safe)
    B_small = jnp.where(small_th, 1.0 / 6.0 + sigma / 8.0,
                        (theta - jnp.sin(theta)) / (th2_safe * th_safe))
    B = jnp.where(small_sig, B_small, jnp.where(small_th, B_sig, B_gen))

    return C * jnp.eye(3, dtype=dtype) + A * Om + B * (Om @ Om)


def sim3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """sim(3) tangent (7,) = (v, w, sigma) -> similarity matrix (4,4)."""
    v, w, sigma = xi[:3], xi[3:6], xi[6]
    S = jnp.eye(4, dtype=xi.dtype)
    S = S.at[:3, :3].set(jnp.exp(sigma) * so3_exp(w))
    S = S.at[:3, 3].set(_sim3_W(w, sigma) @ v)
    return S


def sim3_log(S: jnp.ndarray) -> jnp.ndarray:
    """Similarity matrix (4,4) -> tangent (7,) = (v, w, sigma)."""
    sR = S[:3, :3]
    # det(sR) = s^3: differentiable scale extraction, exact for any s > 0.
    s = jnp.cbrt(jnp.linalg.det(sR))
    sigma = jnp.log(s)
    R = sR / s
    w = so3_log(R)
    v = jnp.linalg.solve(_sim3_W(w, sigma), S[:3, 3])
    return jnp.concatenate([v, w, sigma[None]])


def sim3_from_rt_s(R: jnp.ndarray, t: jnp.ndarray, s) -> jnp.ndarray:
    """(R, t, s) -> [[s*R, t], [0, 1]]."""
    S = jnp.eye(4, dtype=R.dtype)
    S = S.at[:3, :3].set(jnp.asarray(s) * R)
    S = S.at[:3, 3].set(t.reshape(3))
    return S


def invert_sim3(S: jnp.ndarray) -> jnp.ndarray:
    """Similarity inverse: [[sR, t]]^-1 = [[(1/s)R^T, -(1/s)R^T t]]."""
    sR = S[:3, :3]
    s2 = jnp.sum(sR[0] * sR[0])  # |s*R row|^2 = s^2
    Rts = sR.T / s2  # = R^T / s
    Si = jnp.eye(4, dtype=S.dtype)
    Si = Si.at[:3, :3].set(Rts)
    Si = Si.at[:3, 3].set(-(Rts @ S[:3, 3]))
    return Si


def sim3_to_se3(S: jnp.ndarray) -> jnp.ndarray:
    """Camera pose from a Sim(3) node: [[sR, t]] -> [[R, t/s]].

    The Strasdat convention: after Sim(3) pose-graph optimization the
    node's rigid pose is the rotation with the translation de-scaled."""
    sR = S[:3, :3]
    s = jnp.cbrt(jnp.linalg.det(sR))
    T = jnp.eye(4, dtype=S.dtype)
    T = T.at[:3, :3].set(sR / s)
    T = T.at[:3, 3].set(S[:3, 3] / s)
    return T

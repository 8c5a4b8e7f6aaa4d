"""P3P + RANSAC + Gauss-Newton pose estimation from 2D<->3D correspondences.

TPU-native replacement for ``cv2.solvePnPRansac(flags=SOLVEPNP_P3P)``
(reference VisualOdometryPipeLine.py:343; params main.py:41-43: 500 iters,
reproj 8/5 px; SURVEY.md N8).

Design:
  * Grunert's P3P: three world points + three bearing rays reduce to a real
    quartic in the distance ratio; solved closed-form (ops/polysolve.py) —
    no eigensolver, fully vmappable.  Each hypothesis yields up to 4 poses;
    ALL of them enter the scoring pool (OpenCV instead burns a 4th sampled
    point to disambiguate — scoring everything is free in parallel).
  * Absolute orientation from the 3 recovered camera-frame points by a
    closed-form 3-point Kabsch (cross-product frame alignment, no SVD).
  * Winner refined by masked Gauss-Newton on all inliers (reprojection
    error, se(3) parametrization) — OpenCV's solvePnPRansac similarly
    refines with its iterative solver.

Everything is fixed-shape: N points with validity mask, I hypotheses, static
iteration counts.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import lie, linalg
from ..core.camera import Camera
from . import polysolve, ransac


def _p3p_grunert(X: jnp.ndarray, rays: jnp.ndarray):
    """Grunert's P3P for one minimal sample.

    Args:
      X: (3, 3) world points.
      rays: (3, 3) unit bearing vectors in the camera frame.

    Returns:
      T_CW: (4, 4, 4) up to four camera-from-world transforms.
      ok:   (4,) bool validity of each solution.
    """
    X1, X2, X3 = X[0], X[1], X[2]
    q1, q2, q3 = rays[0], rays[1], rays[2]

    a = jnp.linalg.norm(X2 - X3)  # side opposite vertex 1
    b = jnp.linalg.norm(X1 - X3)  # side opposite vertex 2
    c = jnp.linalg.norm(X1 - X2)  # side opposite vertex 3

    cos_alpha = jnp.dot(q2, q3)
    cos_beta = jnp.dot(q1, q3)
    cos_gamma = jnp.dot(q1, q2)

    a2, b2, c2 = a * a, b * b, c * c
    # Grunert / Haralick: quartic in v where s3 = v s1.
    amc = (a2 - c2) / b2
    apc = (a2 + c2) / b2
    bmc = (b2 - c2) / b2
    bma = (b2 - a2) / b2

    A4 = (amc - 1.0) ** 2 - 4.0 * (c2 / b2) * cos_alpha**2
    A3 = 4.0 * (
        amc * (1.0 - amc) * cos_beta
        - (1.0 - apc) * cos_alpha * cos_gamma
        + 2.0 * (c2 / b2) * cos_alpha**2 * cos_beta
    )
    A2 = 2.0 * (
        amc**2
        - 1.0
        + 2.0 * amc**2 * cos_beta**2
        + 2.0 * bmc * cos_alpha**2
        - 4.0 * apc * cos_alpha * cos_beta * cos_gamma
        + 2.0 * bma * cos_gamma**2
    )
    A1 = 4.0 * (
        -amc * (1.0 + amc) * cos_beta
        + 2.0 * (a2 / b2) * cos_gamma**2 * cos_beta
        - (1.0 - apc) * cos_alpha * cos_gamma
    )
    A0 = (1.0 + amc) ** 2 - 4.0 * (a2 / b2) * cos_gamma**2

    A4_safe = jnp.where(jnp.abs(A4) < 1e-12, 1e-12, A4)
    roots, is_real = polysolve.quartic_roots(
        A3 / A4_safe, A2 / A4_safe, A1 / A4_safe, A0 / A4_safe
    )

    def pose_from_v(v):
        # Back-substitute for u (s2 = u s1):
        u = ((-1.0 + amc) * v * v - 2.0 * amc * cos_beta * v + 1.0 + amc) / (
            2.0 * (cos_gamma - v * cos_alpha)
        )
        s1_sq = b2 / (1.0 + v * v - 2.0 * v * cos_beta)
        s1 = jnp.sqrt(jnp.maximum(s1_sq, 1e-12))
        s2 = u * s1
        s3 = v * s1
        ok = (v > 0) & (u > 0) & (s1_sq > 1e-12)

        # Newton-polish the distances on the law-of-cosines system — the
        # Grunert quartic is ill-conditioned in f32 (observed ~0.5 deg pose
        # error without this; ~1e-3 deg with it).
        def newton(s, _):
            s1n, s2n, s3n = s[0], s[1], s[2]
            f = jnp.stack([
                s2n * s2n + s3n * s3n - 2 * s2n * s3n * cos_alpha - a2,
                s1n * s1n + s3n * s3n - 2 * s1n * s3n * cos_beta - b2,
                s1n * s1n + s2n * s2n - 2 * s1n * s2n * cos_gamma - c2,
            ])
            z = jnp.zeros_like(s1n)
            J = 2.0 * jnp.stack([
                jnp.stack([z, s2n - s3n * cos_alpha, s3n - s2n * cos_alpha]),
                jnp.stack([s1n - s3n * cos_beta, z, s3n - s1n * cos_beta]),
                jnp.stack([s1n - s2n * cos_gamma, s2n - s1n * cos_gamma, z]),
            ])
            J = J + 1e-9 * jnp.eye(3, dtype=J.dtype)
            step = linalg.solve3(J, f)
            s_new = s - step
            return jnp.where(jnp.all(jnp.isfinite(s_new)), s_new, s), None

        s_vec, _ = jax.lax.scan(newton, jnp.stack([s1, s2, s3]), None, length=3)
        s1, s2, s3 = s_vec[0], s_vec[1], s_vec[2]

        # Camera-frame points.
        Y = jnp.stack([s1 * q1, s2 * q2, s3 * q3])  # (3,3)

        # 3-point Kabsch via orthonormal frame alignment (closed form).
        R, t = _rigid_from_3pts(X, Y)
        T = jnp.eye(4, dtype=X.dtype)
        T = T.at[:3, :3].set(R)
        T = T.at[:3, 3].set(t)
        return T, ok

    Ts, oks = jax.vmap(pose_from_v)(roots)
    return Ts, oks & is_real


def _rigid_from_3pts(X: jnp.ndarray, Y: jnp.ndarray):
    """Rigid transform with Y_i ~= R X_i + t from exactly 3 non-collinear
    point pairs, via alignment of orthonormal frames built on each triad."""

    def frame(P):
        e1 = P[1] - P[0]
        e1 = e1 / jnp.maximum(jnp.linalg.norm(e1), 1e-12)
        v2 = P[2] - P[0]
        e2 = v2 - jnp.dot(v2, e1) * e1
        e2 = e2 / jnp.maximum(jnp.linalg.norm(e2), 1e-12)
        e3 = jnp.cross(e1, e2)
        return jnp.stack([e1, e2, e3], axis=1)  # columns

    Fx = frame(X)
    Fy = frame(Y)
    R = Fy @ Fx.T
    t = Y[0] - R @ X[0]
    return R, t


def reprojection_errors(T_CW: jnp.ndarray, cam: Camera, X: jnp.ndarray,
                        uv: jnp.ndarray):
    """Pixel reprojection error (N,) of world points under extrinsics T_CW.
    Points behind the camera get +inf."""
    Xc = X @ T_CW[:3, :3].T + T_CW[:3, 3]
    z = Xc[:, 2]
    proj = cam.project(Xc)
    err = jnp.linalg.norm(proj - uv, axis=-1)
    return jnp.where(z > 1e-6, err, jnp.inf)


def refine_pose_gn(
    T_CW: jnp.ndarray,
    cam: Camera,
    X: jnp.ndarray,
    uv: jnp.ndarray,
    w: jnp.ndarray,  # (N,) weights (inlier mask)
    iters: int = 5,
):
    """Masked Gauss-Newton on reprojection error, se(3) increments.

    Left-multiplicative update: T <- exp(xi) T.  Analytic 2x6 Jacobians.
    """

    def gn_step(T, _):
        Rm = T[:3, :3]
        tm = T[:3, 3]
        Xc = X @ Rm.T + tm  # (N, 3)
        x, y, z = Xc[:, 0], Xc[:, 1], Xc[:, 2]
        z = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
        iz = 1.0 / z
        iz2 = iz * iz

        u_err = cam.fx * x * iz + cam.cx - uv[:, 0]
        v_err = cam.fy * y * iz + cam.cy - uv[:, 1]

        # d(proj)/d(Xc): (N, 2, 3)
        Jp = jnp.stack(
            [
                jnp.stack([cam.fx * iz, jnp.zeros_like(z), -cam.fx * x * iz2], -1),
                jnp.stack([jnp.zeros_like(z), cam.fy * iz, -cam.fy * y * iz2], -1),
            ],
            axis=1,
        )
        # d(Xc)/d(xi) for left-mult exp(xi) T: [I | -hat(Xc)] (v then w).
        hatX = jax.vmap(lie.hat)(Xc)  # (N, 3, 3)
        Jx = jnp.concatenate(
            [jnp.broadcast_to(jnp.eye(3), hatX.shape), -hatX], axis=-1
        )  # (N, 3, 6)
        J = Jp @ Jx  # (N, 2, 6)
        r = jnp.stack([u_err, v_err], axis=1)  # (N, 2)

        Jw = J * w[:, None, None]
        H = jnp.einsum("nij,nik->jk", Jw, J,
                       precision="highest") + 1e-6 * jnp.eye(6)
        g = jnp.einsum("nij,ni->j", Jw, r, precision="highest")
        xi = -jnp.linalg.solve(H, g)
        return lie.se3_exp(xi) @ T, None

    T_out, _ = jax.lax.scan(gn_step, T_CW, None, length=iters)
    return T_out


def solve_pnp_ransac(
    key: jax.Array,
    cam: Camera,
    X: jnp.ndarray,  # (N, 3) world points
    uv: jnp.ndarray,  # (N, 2) pixel observations
    valid: jnp.ndarray,  # (N,) bool
    *,
    iterations: int = 500,
    reproj_threshold_px: float = 8.0,
    refine_iters: int = 5,
    min_points: int = 8,
):
    """Full PnP-RANSAC. Returns (T_CW (4,4), inliers (N,) bool, ok ())."""
    rays = cam.backproject(uv)
    rays = rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)

    idx, hyp_ok = ransac.sample_minimal_sets(key, valid, iterations, 3)

    def solve_one(sample_idx):
        return _p3p_grunert(X[sample_idx], rays[sample_idx])

    Ts, oks = jax.vmap(solve_one)(idx)  # (I, 4, 4, 4), (I, 4)
    Ts = Ts.reshape(-1, 4, 4)
    oks = (oks & hyp_ok[:, None]).reshape(-1)

    def score_one(T, ok):
        err = reprojection_errors(T, cam, X, uv)
        inl = (err < reproj_threshold_px) & valid
        return jnp.where(ok, jnp.sum(inl), -1)

    scores = jax.vmap(score_one)(Ts, oks)
    best = jnp.argmax(scores)
    T_best = Ts[best]
    found = scores[best] >= jnp.maximum(min_points // 2, 4)

    inl = (reprojection_errors(T_best, cam, X, uv) < reproj_threshold_px) & valid
    T_ref = refine_pose_gn(T_best, cam, X, uv, inl.astype(jnp.float32),
                           iters=refine_iters)
    inl_ref = (reprojection_errors(T_ref, cam, X, uv) < reproj_threshold_px) & valid
    # Keep the refinement only if it didn't lose inliers (robustness guard).
    better = jnp.sum(inl_ref) >= jnp.sum(inl)
    T_out = jnp.where(better, T_ref, T_best)
    inl_out = jnp.where(better, inl_ref, inl)
    ok = found & (jnp.sum(inl_out) >= min_points)
    return T_out, inl_out, ok

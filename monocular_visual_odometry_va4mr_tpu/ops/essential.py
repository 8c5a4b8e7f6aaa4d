"""Essential-matrix estimation + relative-pose recovery (bootstrap geometry).

TPU-native replacement for ``cv2.findEssentialMat`` + ``cv2.recoverPose``
(reference VisualOdometryPipeLine.py:308,:315; SURVEY.md N5/N6).

v1 solver: normalized 8-point inside a static RANSAC bank (SURVEY.md §7 "fall
back to 8-point ... adequate for these datasets' inlier ratios"), nullspace by
``eigh`` of the 9x9 normal matrix (symmetric — TPU native), rank-2 projection
by closed-form 3x3 SVD built from ``eigh`` of E^T E, Sampson-distance inlier
gating in pixels, masked least-squares re-fit on the winning inlier set.

Pose recovery: the standard U W V^T factorization -> 4 (R, t) candidates,
cheirality vote by batched two-view triangulation depth counts.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.camera import Camera
from . import ransac, triangulate


def _hartley_normalize(pts: jnp.ndarray, w: jnp.ndarray):
    """Similarity-normalize points (mean 0, RMS sqrt(2)) with weights w.

    Returns (normalized pts, 3x3 transform T with x_n = T @ hom(x))."""
    wsum = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(pts * w[:, None], axis=0) / wsum
    centered = pts - mean
    rms = jnp.sqrt(jnp.sum(jnp.sum(centered**2, -1) * w) / wsum) + 1e-12
    s = jnp.sqrt(2.0) / rms
    T = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    T = T.at[0, 0].set(s).at[1, 1].set(s).at[:2, 2].set(-s * mean)
    return centered * s, T


def _eight_point(x0: jnp.ndarray, x1: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Weighted 8-point algorithm on normalized-camera coords.

    x0, x1: (N, 2) normalized coordinates; w: (N,) weights in [0, 1].
    Returns E (3, 3) with the epipolar convention x1^T E x0 = 0.
    """
    x0n, T0 = _hartley_normalize(x0, w)
    x1n, T1 = _hartley_normalize(x1, w)
    u0, v0 = x0n[:, 0], x0n[:, 1]
    u1, v1 = x1n[:, 0], x1n[:, 1]
    ones = jnp.ones_like(u0)
    A = jnp.stack(
        [u1 * u0, u1 * v0, u1, v1 * u0, v1 * v0, v1, u0, v0, ones], axis=-1
    )  # (N, 9)
    Aw = A * w[:, None]
    AtA = Aw.T @ A  # (9, 9) symmetric
    _, vecs = jnp.linalg.eigh(AtA)
    F = vecs[:, 0].reshape(3, 3)
    F = T1.T @ F @ T0  # undo normalization
    # Project to the essential manifold: singular values -> (s, s, 0).
    return project_to_essential(F)


def _svd3_rotations(E: jnp.ndarray):
    """U, s, V^T of a 3x3 via eigh of E^T E / E E^T with sign fixing.

    Avoids generic SVD; guarantees det(U) = det(V) = +1 as recoverPose needs.
    """
    # V from eigh(E^T E): columns = right singular vectors (ascending order).
    _, V = jnp.linalg.eigh(E.T @ E)
    V = V[:, ::-1]  # descending
    s = jnp.sqrt(jnp.maximum(jnp.diagonal(V.T @ (E.T @ E) @ V), 0.0))
    # U columns: E v_i / s_i for the two nonzero singular values.
    u0 = E @ V[:, 0] / jnp.maximum(s[0], 1e-12)
    u1 = E @ V[:, 1] / jnp.maximum(s[1], 1e-12)
    u2 = jnp.cross(u0, u1)
    U = jnp.stack([u0, u1, u2], axis=1)
    # Make both proper rotations.
    V = V.at[:, 2].multiply(jnp.sign(jnp.linalg.det(V)))
    U = U.at[:, 2].multiply(jnp.sign(jnp.linalg.det(U)))
    return U, s, V


def project_to_essential(F: jnp.ndarray) -> jnp.ndarray:
    U, s, V = _svd3_rotations(F)
    sigma = 0.5 * (s[0] + s[1])
    S = jnp.diag(jnp.array([1.0, 1.0, 0.0], F.dtype) * sigma)
    return U @ S @ V.T


def sampson_distance_sq(F: jnp.ndarray, uv0: jnp.ndarray, uv1: jnp.ndarray):
    """Squared Sampson distance (px^2) of pixel correspondences under a
    fundamental matrix F (cv2.findEssentialMat's inlier metric)."""
    x0 = jnp.concatenate([uv0, jnp.ones_like(uv0[..., :1])], -1)
    x1 = jnp.concatenate([uv1, jnp.ones_like(uv1[..., :1])], -1)
    Fx0 = x0 @ F.T  # (N, 3) = F @ x0
    Ftx1 = x1 @ F  # (N, 3) = F^T @ x1
    num = jnp.sum(x1 * Fx0, axis=-1) ** 2
    den = Fx0[..., 0] ** 2 + Fx0[..., 1] ** 2 + Ftx1[..., 0] ** 2 + Ftx1[..., 1] ** 2
    return num / jnp.maximum(den, 1e-12)


def find_essential_ransac(
    key: jax.Array,
    cam: Camera,
    uv0: jnp.ndarray,  # (N, 2) pixels, first view
    uv1: jnp.ndarray,  # (N, 2) pixels, second view
    valid: jnp.ndarray,  # (N,) bool
    *,
    iterations: int = 1000,
    threshold_px: float = 1.0,
):
    """RANSAC essential matrix. Returns (E, inlier_mask, ok).

    Convention: x1^T E x0 = 0 with x = normalized coords — the same as
    ``cv2.findEssentialMat(points1=uv0, points2=uv1)`` (reference :308).
    """
    Kinv = cam.inv_matrix()
    x0 = cam.normalize(uv0)
    x1 = cam.normalize(uv1)

    idx, hyp_ok = ransac.sample_minimal_sets(key, valid, iterations, 8)

    def solve_one(sample_idx):
        w = jnp.zeros_like(valid, jnp.float32).at[sample_idx].set(1.0)
        return _eight_point(x0, x1, w)

    Es = jax.vmap(solve_one)(idx)  # (I, 3, 3)

    # Score every hypothesis against every point (pixels, Sampson).
    K = cam.matrix()
    Fs = jnp.einsum("ij,njk,kl->nil", Kinv.T, Es, Kinv)

    def score_one(F):
        d2 = sampson_distance_sq(F, uv0, uv1)
        inl = (d2 < threshold_px**2) & valid
        return jnp.sum(inl)

    scores = jax.vmap(score_one)(Fs)
    best, _, any_ok = ransac.best_hypothesis(scores, hyp_ok)

    # Re-fit on the winning inlier set (masked least squares).
    F_best = Fs[best]
    inl = (sampson_distance_sq(F_best, uv0, uv1) < threshold_px**2) & valid
    E = _eight_point(x0, x1, inl.astype(jnp.float32))
    F = Kinv.T @ E @ Kinv
    inl = (sampson_distance_sq(F, uv0, uv1) < threshold_px**2) & valid
    return E, inl, any_ok


def recover_pose(
    E: jnp.ndarray,
    cam: Camera,
    uv0: jnp.ndarray,
    uv1: jnp.ndarray,
    mask: jnp.ndarray,
):
    """Cheirality-disambiguated relative pose from an essential matrix.

    Equivalent of ``cv2.recoverPose`` (reference :315): returns (R, t) with
    x_cam1 = R @ x_cam0 + t, |t| = 1, chosen among the 4 factorizations by
    the positive-depth vote over ``mask`` correspondences.
    """
    U, _, V = _svd3_rotations(E)
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    Ra = U @ W @ V.T
    Rb = U @ W.T @ V.T
    t = U[:, 2]

    Rs = jnp.stack([Ra, Ra, Rb, Rb])
    ts = jnp.stack([t, -t, t, -t])

    Kmat = cam.matrix()
    P0 = Kmat @ jnp.eye(3, 4, dtype=E.dtype)

    def depth_votes(R, tt):
        P1 = Kmat @ jnp.concatenate([R, tt[:, None]], axis=1)
        X = triangulate.triangulate_dlt(
            jnp.broadcast_to(P0, (uv0.shape[0], 3, 4)),
            jnp.broadcast_to(P1, (uv0.shape[0], 3, 4)),
            uv0,
            uv1,
        )
        z0 = X[:, 2]
        z1 = X @ R[2] + tt[2]
        # cv2 also caps depth at 50/|t| to reject points at infinity; with
        # |t|=1 that's z < 50.
        good = (z0 > 0) & (z1 > 0) & (z0 < 50.0) & (z1 < 50.0) & mask
        return jnp.sum(good)

    votes = jax.vmap(depth_votes)(Rs, ts)
    k = jnp.argmax(votes)
    return Rs[k], ts[k], votes[k]

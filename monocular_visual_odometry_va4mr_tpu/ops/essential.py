"""Essential-matrix estimation + relative-pose recovery (bootstrap geometry).

TPU-native replacement for ``cv2.findEssentialMat`` + ``cv2.recoverPose``
(reference VisualOdometryPipeLine.py:308,:315; SURVEY.md N5/N6).

Two minimal solvers feed the static RANSAC bank:
  * "5point" (default): Nistér 5-point (ops/essential5.py) — the solver
    cv2.findEssentialMat actually runs; exact on planar scenes where 8-point
    is degenerate.
  * "8point": normalized 8-point, nullspace by ``eigh`` of the 9x9 normal
    matrix (symmetric — TPU native), rank-2 projection by closed-form 3x3 SVD
    built from ``eigh`` of E^T E.  Kept as the cheap fallback and as the
    least-squares re-fit on the winning inlier set (both solvers).

Inliers are gated by Sampson distance in pixels (cv2's metric).

Pose recovery: the standard U W V^T factorization -> 4 (R, t) candidates,
cheirality vote by batched two-view triangulation depth counts.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.camera import Camera
from . import essential5, ransac, triangulate


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
    # Full-f32 accumulation (TPU default matmul precision is bf16-grade and
    # the 8-point normal matrix is what fixes the E nullspace).
    AtA = jnp.einsum("ni,nj->ij", Aw, A, precision="highest")  # (9, 9)
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


def _hat(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.array([
        [0.0, -v[2], v[1]],
        [v[2], 0.0, -v[0]],
        [-v[1], v[0], 0.0],
    ])


def refine_essential_gn(
    E: jnp.ndarray,
    x0: jnp.ndarray,  # (N, 2) normalized coords, first view
    x1: jnp.ndarray,  # (N, 2) normalized coords, second view
    w: jnp.ndarray,  # (N,) weights in [0, 1] (the inlier mask)
    iters: int = 8,
):
    """Gauss-Newton refinement of E on the essential manifold.

    Parametrizes E = [t]x R with 5 dof (so(3) + 2-dof tangent of the unit
    translation) and minimizes the weighted Sampson error in normalized
    coordinates.  This replaces a linear least-squares refit, which is
    rank-deficient on planar scenes — the very case the 5-point solver
    exists for (cv2's RANSAC refines the same way inside findEssentialMat's
    model polishing).
    """
    U, _, V = _svd3_rotations(E)
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]],
                  E.dtype)
    # Any (R, t) factorization works: all four give ±E, and the Sampson
    # error only sees E up to sign/scale.
    R0 = U @ W @ V.T
    t0 = U[:, 2]
    # Orthonormal basis of the plane normal to t0 (stable branchless pick).
    a = jnp.where(jnp.abs(t0[0]) < 0.9,
                  jnp.array([1.0, 0.0, 0.0], E.dtype),
                  jnp.array([0.0, 1.0, 0.0], E.dtype))
    b1 = jnp.cross(t0, a)
    b1 = b1 / jnp.linalg.norm(b1)
    b2 = jnp.cross(t0, b1)
    B = jnp.stack([b1, b2], axis=1)  # (3, 2)

    h0 = jnp.concatenate([x0, jnp.ones_like(x0[:, :1])], -1)
    h1 = jnp.concatenate([x1, jnp.ones_like(x1[:, :1])], -1)

    def sampson(params):
        dw = params[:3]
        db = params[3:]
        R = _so3_exp(dw) @ R0
        t = t0 + B @ db
        t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
        Em = _hat(t) @ R
        Ex0 = h0 @ Em.T
        Etx1 = h1 @ Em
        num = jnp.sum(h1 * Ex0, axis=-1)
        den = jnp.sqrt(Ex0[:, 0]**2 + Ex0[:, 1]**2
                       + Etx1[:, 0]**2 + Etx1[:, 1]**2 + 1e-18)
        return (num / den) * w

    params = jnp.zeros((5,), E.dtype)
    for _ in range(iters):
        r = sampson(params)
        J = jax.jacfwd(sampson)(params)  # (N, 5)
        JtJ = jnp.einsum("ni,nj->ij", J, J,
                         precision="highest") + 1e-9 * jnp.eye(5, dtype=E.dtype)
        step = jnp.linalg.solve(JtJ, jnp.einsum("ni,n->i", J, r,
                                                precision="highest"))
        new_params = params - step
        params = jnp.where(jnp.all(jnp.isfinite(new_params)), new_params,
                           params)

    dw = params[:3]
    db = params[3:]
    R = _so3_exp(dw) @ R0
    t = t0 + B @ db
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
    E_ref = _hat(t) @ R
    return E_ref / jnp.maximum(jnp.linalg.norm(E_ref), 1e-12)


def _so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues exp map (local copy to keep ops/ free of core/ imports)."""
    th2 = jnp.sum(w * w)
    th = jnp.sqrt(th2 + 1e-24)
    K = _hat(w / th)
    s = jnp.sin(th)
    c = jnp.cos(th)
    Rbig = jnp.eye(3, dtype=w.dtype) + s * K + (1.0 - c) * (K @ K)
    Rsmall = jnp.eye(3, dtype=w.dtype) + _hat(w)
    return jnp.where(th2 > 1e-12, Rbig, Rsmall)


def find_essential_ransac(
    key: jax.Array,
    cam: Camera,
    uv0: jnp.ndarray,  # (N, 2) pixels, first view
    uv1: jnp.ndarray,  # (N, 2) pixels, second view
    valid: jnp.ndarray,  # (N,) bool
    *,
    iterations: int = 1000,
    threshold_px: float = 1.0,
    solver: str = "5point",
):
    """RANSAC essential matrix. Returns (E, inlier_mask, ok).

    Convention: x1^T E x0 = 0 with x = normalized coords — the same as
    ``cv2.findEssentialMat(points1=uv0, points2=uv1)`` (reference :308).

    ``solver`` picks the minimal solver for the hypothesis bank: "5point"
    (Nistér; up to 10 essential matrices per sample, all scored) or "8point".
    The final re-fit on the winning inlier set is 8-point either way (an
    overdetermined least-squares refit, where 8-point is the right tool).
    """
    Kinv = cam.inv_matrix()
    x0 = cam.normalize(uv0)
    x1 = cam.normalize(uv1)

    if solver == "5point":
        idx, samp_ok = ransac.sample_minimal_sets(key, valid, iterations, 5)

        def solve5(sample_idx):
            return essential5.five_point_essentials(
                x0[sample_idx], x1[sample_idx])

        Es, e_ok = jax.vmap(solve5)(idx)  # (I, 10, 3, 3), (I, 10)
        Es = Es.reshape(-1, 3, 3)
        hyp_ok = (e_ok & samp_ok[:, None]).reshape(-1)
    elif solver == "8point":
        idx, hyp_ok = ransac.sample_minimal_sets(key, valid, iterations, 8)

        def solve_one(sample_idx):
            w = jnp.zeros_like(valid, jnp.float32).at[sample_idx].set(1.0)
            return _eight_point(x0, x1, w)

        Es = jax.vmap(solve_one)(idx)  # (I, 3, 3)
    else:
        raise ValueError(f"unknown essential solver: {solver!r}")

    # Score every hypothesis against every point (pixels, Sampson).
    K = cam.matrix()
    Fs = jnp.einsum("ij,njk,kl->nil", Kinv.T, Es, Kinv)

    def score_one(F):
        d2 = sampson_distance_sq(F, uv0, uv1)
        inl = (d2 < threshold_px**2) & valid
        return jnp.sum(inl)

    scores = jax.vmap(score_one)(Fs)
    best, _, any_ok = ransac.best_hypothesis(scores, hyp_ok)

    if solver == "5point":
        # Planar two-fold ambiguity: on (near-)planar scenes two essential
        # matrices fit ALL correspondences with equal Sampson error and only
        # cheirality separates them.  Rescore the top-K Sampson candidates
        # by positive-depth votes (what cv2 does inside recoverPose) and
        # keep the member of the pair with the physical interpretation.
        k_top = 8
        masked = jnp.where(hyp_ok, scores, -1)
        _, top_idx = jax.lax.top_k(masked, k_top)

        def cheirality_votes(i):
            F = Fs[i]
            inl_i = (sampson_distance_sq(F, uv0, uv1) < threshold_px**2) & valid
            _, _, votes = recover_pose(Es[i], cam, uv0, uv1, inl_i)
            return votes

        votes = jax.vmap(cheirality_votes)(top_idx)
        votes = jnp.where(masked[top_idx] >= 0, votes, -1)
        best = top_idx[jnp.argmax(votes)]

    # Re-fit on the winning inlier set.
    F_best = Fs[best]
    inl = (sampson_distance_sq(F_best, uv0, uv1) < threshold_px**2) & valid
    if solver == "5point":
        # Gauss-Newton on the essential manifold: a LINEAR refit is itself
        # rank-deficient on planar scenes (the case 5-point exists for), and
        # GN also polishes away the minimal solver's f32 hypothesis noise.
        E = refine_essential_gn(Es[best], x0, x1, inl.astype(jnp.float32))
    else:
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

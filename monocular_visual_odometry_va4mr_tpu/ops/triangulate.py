"""Batched two-view triangulation + promotion gates.

TPU-native replacement for the reference's hottest Python loop
(``triangulate_landmarks``, reference VisualOdometryPipeLine.py:107-206 —
a per-candidate Python loop calling ``cv2.triangulatePoints`` once per point,
SURVEY.md CS4).  Here the entire candidate table is triangulated and gated in
one fused, fixed-shape call:

  * DLT linear system per point: 4x4 symmetric normal matrix, smallest
    eigenvector via batched ``eigh`` (TPU-supported; no generic SVD needed).
  * baseline-angle gate (reference :117-147) as a masked vector op,
  * two-view depth gate (reference :149-168 ``disambguate_landmark``) as a
    masked vector op.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import linalg
from ..core.camera import Camera, projection_matrix


def triangulate_dlt(P0: jnp.ndarray, P1: jnp.ndarray, uv0: jnp.ndarray,
                    uv1: jnp.ndarray) -> jnp.ndarray:
    """Homogeneous DLT triangulation.

    Args:
      P0: (..., 3, 4) projection K[R|t] of the first view.
      P1: (..., 3, 4) projection of the second view.
      uv0, uv1: (..., 2) pixel observations.

    Returns (..., 3) world points.  Mirrors ``cv2.triangulatePoints``
    (reference VisualOdometryPipeLine.py:188-194) but batched: builds the 4x4
    DLT matrix A, takes the eigenvector of min eigenvalue of A^T A.
    """
    rows = jnp.stack(
        [
            uv0[..., 0, None] * P0[..., 2, :] - P0[..., 0, :],
            uv0[..., 1, None] * P0[..., 2, :] - P0[..., 1, :],
            uv1[..., 0, None] * P1[..., 2, :] - P1[..., 0, :],
            uv1[..., 1, None] * P1[..., 2, :] - P1[..., 1, :],
        ],
        axis=-2,
    )  # (..., 4, 4)
    # Row-normalize for conditioning (cv2 does an equivalent scaling).
    norm = jnp.linalg.norm(rows, axis=-1, keepdims=True)
    rows = rows / jnp.maximum(norm, 1e-12)
    # Inhomogeneous solve (w = 1): 3x3 normal equations in closed form.
    # Batched tiny eigh/SVD lowers to scalar loops on TPU; the adjugate
    # inverse fuses into the surrounding elementwise code.  Differs from the
    # homogeneous DLT only for points at infinity, which the depth gate
    # rejects anyway.
    M = rows[..., :3]  # (..., 4, 3)
    a = rows[..., 3]  # (..., 4)
    # Full-f32 contraction: TPU's default matmul precision is bf16-grade,
    # which visibly biases triangulated depths.
    N = jnp.einsum("...ki,...kj->...ij", M, M, precision="highest")
    b = -jnp.einsum("...ki,...k->...i", M, a, precision="highest")
    return linalg.solve3(N, b)


def bearing_angle_deg(
    cam: Camera,
    uv0: jnp.ndarray,  # (..., 2) pixel obs in view 0
    uv1: jnp.ndarray,  # (..., 2) pixel obs in view 1
    R0_CW: jnp.ndarray,  # (..., 3, 3) world->cam rotation of view 0
    R1_CW: jnp.ndarray,  # (3, 3) world->cam rotation of view 1 (current)
) -> jnp.ndarray:
    """Angle between the two viewing rays, in degrees (reference
    ``check_baseline``, VisualOdometryPipeLine.py:117-147).

    Rays are compared in the world frame: d_i = R_i_CW^T K^-1 hom(uv_i).
    """
    r0 = cam.backproject(uv0)  # (..., 3) in cam0 frame
    r1 = cam.backproject(uv1)  # (..., 3) in cam1 frame
    d0 = jnp.einsum("...ji,...j->...i", R0_CW, r0)  # R^T r
    d1 = jnp.einsum("ji,...j->...i", R1_CW, r1)
    cos = jnp.sum(d0 * d1, axis=-1) / (
        jnp.linalg.norm(d0, axis=-1) * jnp.linalg.norm(d1, axis=-1) + 1e-12
    )
    return jnp.degrees(jnp.arccos(jnp.clip(cos, -1.0, 1.0)))


def depth_gate(
    X: jnp.ndarray,  # (..., 3) world points
    T0_CW: jnp.ndarray,  # (..., 4, 4)
    T1_CW: jnp.ndarray,  # (4, 4)
    min_dist: float,
    max_dist: float,
) -> jnp.ndarray:
    """Both-view depth bound check (reference ``disambguate_landmark``,
    VisualOdometryPipeLine.py:149-168): z in (min_dist, max_dist) in both
    camera frames."""
    z0 = jnp.einsum("...j,...j->...", T0_CW[..., 2, :3], X) + T0_CW[..., 2, 3]
    z1 = X @ T1_CW[2, :3] + T1_CW[2, 3]
    return (z0 > min_dist) & (z0 < max_dist) & (z1 > min_dist) & (z1 < max_dist)


def triangulate_candidates(
    cam: Camera,
    uv_first: jnp.ndarray,  # (M, 2)
    uv_cur: jnp.ndarray,  # (M, 2)
    T_CW_first: jnp.ndarray,  # (M, 4, 4) per-candidate first-obs extrinsics
    T_CW_cur: jnp.ndarray,  # (4, 4) current extrinsics
    valid: jnp.ndarray,  # (M,) bool
    age: jnp.ndarray,  # (M,) int32 frames since first obs
    *,
    min_baseline_frames: int,
    min_baseline_angle_deg: float,
    min_dist: float,
    max_dist: float,
    enforce_age: bool = True,
):
    """The whole of reference CS4 in one call.

    Returns:
      X: (M, 3) triangulated world points (garbage where not promoted).
      promote: (M,) bool — candidate passed age + angle + depth gates.
      keep: (M,) bool — candidate stays in the table (valid but not promoted).
    """
    # Age gate (reference :175-178; skipped during bootstrap per Quirk Q4 —
    # callers pass enforce_age=False there).
    old_enough = age > min_baseline_frames if enforce_age else jnp.ones_like(valid)

    angle = bearing_angle_deg(
        cam, uv_first, uv_cur, T_CW_first[:, :3, :3], T_CW_cur[:3, :3]
    )
    angle_ok = angle >= min_baseline_angle_deg

    P_first = jnp.einsum("ij,njk->nik", cam.matrix(), T_CW_first[:, :3, :4])
    P_cur = projection_matrix(cam, T_CW_cur)
    X = triangulate_dlt(P_first, jnp.broadcast_to(P_cur, P_first.shape),
                        uv_first, uv_cur)

    depth_ok = depth_gate(X, T_CW_first, T_CW_cur, min_dist, max_dist)

    promote = valid & old_enough & angle_ok & depth_ok
    keep = valid & ~promote
    return X, promote, keep

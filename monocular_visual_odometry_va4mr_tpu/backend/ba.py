"""Sliding-window bundle adjustment with Schur-complement Gauss-Newton.

NEW capability — absent in the reference, whose back-end is frame-to-frame
only (SURVEY.md §7 layer 7; BASELINE.json north_star: "a new sliding-window
bundle adjustment and pose-graph back-end ... is added on top").

Layout is chosen for TPU and for the distributed Schur reduction
(parallel/ba_sharded.py):

  * A window of ``W`` keyframe extrinsics (W,4,4) and ``L`` landmark slots
    (L,3) with a dense observation grid obs_uv (W,L,2) + obs_mask (W,L) —
    fixed shapes, masked sparsity.
  * One Gauss-Newton/LM iteration builds all Jacobian blocks in fused
    einsums (MXU work), inverts the 3x3 landmark blocks closed-form,
    Schur-reduces to the 6W x 6W camera system, solves, back-substitutes.
  * The landmark axis L is the natural shard axis: every per-landmark
    quantity (Hpp, Hcp, b_p) is local, and the reduced camera system is a
    ``psum`` over shards — exactly the BASELINE.json "camera-system
    all-reduce/psum over ICI" design.

Gauge: pose 0 of the window is frozen (its camera block is pinned to the
identity system), which also anchors the monocular scale within the window.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie
from ..core.camera import Camera


class BAWindow(NamedTuple):
    """The bundle-adjustment problem state (a jittable pytree)."""

    T_CW: jnp.ndarray  # (W, 4, 4) keyframe extrinsics
    lm_xyz: jnp.ndarray  # (L, 3) landmarks
    obs_uv: jnp.ndarray  # (W, L, 2) pixel observations
    obs_mask: jnp.ndarray  # (W, L) bool


from ..core.linalg import inv3 as _inv3  # closed-form batched 3x3 inverse


def _residuals_and_jacobians(window: BAWindow, cam: Camera,
                             huber_px: float):
    """All residuals r (W,L,2), camera Jacobians Jc (W,L,2,6), point
    Jacobians Jp (W,L,2,3) and robust weights w (W,L)."""
    R = window.T_CW[:, :3, :3]  # (W,3,3)
    t = window.T_CW[:, :3, 3]  # (W,3)
    Xc = jnp.einsum("wij,lj->wli", R, window.lm_xyz) + t[:, None, :]
    x, y, z = Xc[..., 0], Xc[..., 1], Xc[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    iz = 1.0 / z_safe
    iz2 = iz * iz

    u = cam.fx * x * iz + cam.cx
    v = cam.fy * y * iz + cam.cy
    r = jnp.stack([u, v], -1) - window.obs_uv  # (W,L,2)

    zeros = jnp.zeros_like(z)
    Jproj = jnp.stack(
        [
            jnp.stack([cam.fx * iz, zeros, -cam.fx * x * iz2], -1),
            jnp.stack([zeros, cam.fy * iz, -cam.fy * y * iz2], -1),
        ],
        -2,
    )  # (W,L,2,3) d(uv)/d(Xc)

    # d(Xc)/d(xi) for left-mult exp(xi) T: [I | -hat(Xc)].
    hatX = jnp.zeros(Xc.shape[:-1] + (3, 3), Xc.dtype)
    hatX = hatX.at[..., 0, 1].set(-Xc[..., 2]).at[..., 0, 2].set(Xc[..., 1])
    hatX = hatX.at[..., 1, 0].set(Xc[..., 2]).at[..., 1, 2].set(-Xc[..., 0])
    hatX = hatX.at[..., 2, 0].set(-Xc[..., 1]).at[..., 2, 1].set(Xc[..., 0])
    eye = jnp.broadcast_to(jnp.eye(3, dtype=Xc.dtype), hatX.shape)
    Jxi = jnp.concatenate([eye, -hatX], -1)  # (W,L,3,6)
    Jc = Jproj @ Jxi  # (W,L,2,6)
    Jp = jnp.einsum("wlab,wbc->wlac", Jproj, R)  # d(Xc)/dX = R

    # Behind-camera and non-finite observations are invalid regardless of
    # the mask.  The finiteness guard is load-bearing: INVALID landmark
    # slots can hold Inf/NaN garbage (the slotted state never clears dead
    # rows), and a masked weight alone does not save the reductions —
    # 0 * NaN = NaN poisons the einsum sums.  The residual and Jacobians of
    # every invalid observation are therefore hard-zeroed, not just
    # zero-weighted.  (Measured on-chip: without this, one garbage row
    # NaN'd the whole Schur system at bench frame 63.)
    finite = (jnp.all(jnp.isfinite(Xc), -1)
              & jnp.all(jnp.isfinite(window.obs_uv), -1))
    valid = window.obs_mask & (z > 1e-3) & finite
    r = jnp.where(valid[..., None], r, 0.0)
    Jc = jnp.where(valid[..., None, None], Jc, 0.0)
    Jp = jnp.where(valid[..., None, None], Jp, 0.0)
    rnorm = jnp.linalg.norm(r, axis=-1)
    huber = jnp.where(rnorm <= huber_px, 1.0, huber_px / jnp.maximum(rnorm, 1e-9))
    w = jnp.where(valid, huber, 0.0)
    return r, Jc, Jp, w


def build_normal_blocks(window: BAWindow, cam: Camera, *,
                        huber_px: float = 3.0, damping: float = 1e-4):
    """Everything per-landmark-local needed for the Schur reduction.

    Returns (S (W,W,6,6), rhs (W,6), Hpp_inv (L,3,3), Hcp (W,L,6,3),
    b_p (L,3), cost ()).  In the sharded backend S and rhs are psum'd.
    """
    r, Jc, Jp, w = _residuals_and_jacobians(window, cam, huber_px)

    Hcc = jnp.einsum("wl,wlai,wlaj->wij", w, Jc, Jc)  # (W,6,6)
    Hpp = jnp.einsum("wl,wlai,wlaj->lij", w, Jp, Jp)  # (L,3,3)
    Hcp = jnp.einsum("wl,wlai,wlaj->wlij", w, Jc, Jp)  # (W,L,6,3)
    b_c = jnp.einsum("wl,wlai,wla->wi", w, Jc, r)  # (W,6)
    b_p = jnp.einsum("wl,wlai,wla->li", w, Jp, r)  # (L,3)

    Hpp = Hpp + damping * jnp.eye(3)
    Hpp_inv = _inv3(Hpp)

    # Schur: S = Hcc(blockdiag) - Hcp Hpp^-1 Hcp^T ; rhs = b_c - Hcp Hpp^-1 b_p
    HcpHpi = jnp.einsum("wlij,ljk->wlik", Hcp, Hpp_inv)  # (W,L,6,3)
    S_off = jnp.einsum("wlik,vljk->wvij", HcpHpi, Hcp)  # (W,W,6,6)
    W_ = window.T_CW.shape[0]
    S = -S_off
    S = S.at[jnp.arange(W_), jnp.arange(W_)].add(
        Hcc + damping * jnp.eye(6)
    )
    rhs = b_c - jnp.einsum("wlik,lk->wi", HcpHpi, b_p)  # (W,6)

    cost = 0.5 * jnp.sum(w * jnp.sum(r * r, -1))
    return S, rhs, Hpp_inv, Hcp, b_p, cost


def solve_camera_system(S: jnp.ndarray, rhs: jnp.ndarray,
                        n_fixed: int = 2) -> jnp.ndarray:
    """Solve the reduced camera system with the first ``n_fixed`` poses frozen.

    Freezing two poses pins both the rigid gauge and the monocular scale
    gauge (scaling about the first camera center is otherwise a null
    direction of S)."""
    W = rhs.shape[0]
    S = S.at[:n_fixed, :, :, :].set(0.0).at[:, :n_fixed, :, :].set(0.0)
    for i in range(n_fixed):
        S = S.at[i, i].set(jnp.eye(6))
    rhs = rhs.at[:n_fixed].set(0.0)
    S_mat = S.transpose(0, 2, 1, 3).reshape(6 * W, 6 * W)
    delta = jnp.linalg.solve(S_mat, -rhs.reshape(-1))
    return delta.reshape(W, 6)


def apply_updates(window: BAWindow, delta_c: jnp.ndarray,
                  Hpp_inv: jnp.ndarray, Hcp: jnp.ndarray,
                  b_p: jnp.ndarray) -> BAWindow:
    """Back-substitute landmarks and retract pose updates."""
    # delta_p = Hpp^-1 (-b_p - Hcp^T delta_c)
    HcpT_dc = jnp.einsum("wlij,wi->lj", Hcp, delta_c)
    delta_p = jnp.einsum("lij,lj->li", Hpp_inv, -b_p - HcpT_dc)
    lm = window.lm_xyz + delta_p
    T = jax.vmap(lambda d, T: lie.se3_exp(d) @ T)(delta_c, window.T_CW)
    return window._replace(T_CW=T, lm_xyz=lm)


@functools.partial(jax.jit, static_argnames=("iters", "n_fixed"))
def run_ba(window: BAWindow, cam: Camera, *, iters: int = 5,
           huber_px: float = 3.0, damping: float = 1e-4, n_fixed: int = 2):
    """Run ``iters`` Gauss-Newton iterations; returns (window, costs (iters,))."""

    def one(iter_window, _):
        S, rhs, Hpp_inv, Hcp, b_p, cost = build_normal_blocks(
            iter_window, cam, huber_px=huber_px, damping=damping
        )
        delta_c = solve_camera_system(S, rhs, n_fixed=n_fixed)
        new_window = apply_updates(iter_window, delta_c, Hpp_inv, Hcp, b_p)
        return new_window, cost

    # TPU dots default to bf16; the GN normal equations (squared Jacobians,
    # Schur complement, dense solve) are numerically unsalvageable there —
    # on-chip this produced NaN trajectories while CPU f32 converged.  Force
    # full f32 for every einsum/solve in the BA graph.
    with jax.default_matmul_precision("float32"):
        return jax.lax.scan(one, window, None, length=iters)


def reprojection_rms(window: BAWindow, cam: Camera) -> jnp.ndarray:
    r, _, _, w = _residuals_and_jacobians(window, cam, huber_px=1e9)
    mask = w > 0
    n = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sqrt(jnp.sum(jnp.where(mask, jnp.sum(r * r, -1), 0.0)) / n)

"""Pyramidal Lucas-Kanade feature tracking, batched over a fixed feature table.

TPU-native replacement for ``cv2.calcOpticalFlowPyrLK`` (reference
VisualOdometryPipeLine.py:281,:287; params reference main.py:36-38: winSize
15x15, maxLevel 5/10, 50 iters / eps 0.01).

Design (SURVEY.md N4, N12):
  * The classic inverse-style formulation: per pyramid level the spatial
    gradient matrix G comes from the *previous* frame's window, so G and its
    inverse are computed once per level and only the current-frame window is
    re-sampled inside the iteration loop.
  * Fixed iteration count with a masked epsilon freeze instead of OpenCV's
    data-dependent TERM_CRITERIA loop — identical results, static shapes.
  * The whole feature table (landmarks + candidates merged by the pipeline)
    is tracked in one `vmap`; invalid slots are masked, not skipped.

Status semantics mirror cv2: a track fails if the point leaves the image, the
gradient matrix is degenerate (min eigenvalue below ``min_eig_threshold``), or
the final photometric residual is large (occlusion guard).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.config import KLTConfig
from . import image as imops


def _track_level(
    prev_img: jnp.ndarray,
    next_img: jnp.ndarray,
    prev_gx: jnp.ndarray,
    prev_gy: jnp.ndarray,
    pt_prev: jnp.ndarray,  # (2,) position in this level's coords
    guess: jnp.ndarray,  # (2,) flow guess in this level's coords
    win_offsets: jnp.ndarray,  # (w*w, 2)
    num_iters: int,
    eps: float,
    min_eig_threshold: float,
):
    """One pyramid level of LK for a single feature. Returns (flow, ok)."""
    H, W = prev_img.shape
    coords0 = pt_prev[None, :] + win_offsets  # (w2, 2) template coords

    template = imops.bilinear_sample(prev_img, coords0)  # (w2,)
    ix = imops.bilinear_sample(prev_gx, coords0)
    iy = imops.bilinear_sample(prev_gy, coords0)

    gxx = jnp.sum(ix * ix)
    gxy = jnp.sum(ix * iy)
    gyy = jnp.sum(iy * iy)
    det = gxx * gyy - gxy * gxy
    tr = gxx + gyy
    min_eig = 0.5 * (tr - jnp.sqrt(jnp.maximum(tr * tr - 4.0 * det, 0.0)))
    # cv2 normalizes by window area for the minEigThreshold test.
    w2 = win_offsets.shape[0]
    eig_ok = (min_eig / w2) > min_eig_threshold
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)

    def body(_, carry):
        g, frozen = carry
        coords1 = coords0 + g[None, :]
        cur = imops.bilinear_sample(next_img, coords1)
        diff = cur - template
        b0 = jnp.sum(diff * ix)
        b1 = jnp.sum(diff * iy)
        # Solve G d = -b (2x2).
        d0 = -(gyy * b0 - gxy * b1) * inv_det
        d1 = -(-gxy * b0 + gxx * b1) * inv_det
        d = jnp.stack([d0, d1])
        step_small = jnp.sum(d * d) < eps * eps
        g_new = jnp.where(frozen, g, g + d)
        return g_new, frozen | step_small

    flow, _ = jax.lax.fori_loop(0, num_iters, body, (guess, jnp.array(False)))

    # In-bounds check at the solution (with half-window margin like cv2).
    r = jnp.max(jnp.abs(win_offsets))
    p1 = pt_prev + flow
    inb = (
        (p1[0] >= r) & (p1[0] <= W - 1 - r) & (p1[1] >= r) & (p1[1] <= H - 1 - r)
    )
    return flow, eig_ok & inb


def _track_point(
    prev_pyr, next_pyr, grads, pt: jnp.ndarray, win_offsets, num_iters, eps,
    min_eig_threshold, max_residual,
):
    """Track one feature through all pyramid levels, coarse to fine."""
    L = len(prev_pyr)
    flow = jnp.zeros_like(pt)
    ok = jnp.array(True)
    for lvl in range(L - 1, -1, -1):
        scale = 0.5 ** lvl
        pt_l = pt * scale
        flow = flow * 2.0
        gx, gy = grads[lvl]
        f, lvl_ok = _track_level(
            prev_pyr[lvl], next_pyr[lvl], gx, gy, pt_l, flow, win_offsets,
            num_iters, eps, min_eig_threshold,
        )
        flow = f
        # cv2 semantics: the eig/bounds test only decides status at the
        # finest level; coarse levels just clamp (bilinear_sample clamps).
        if lvl == 0:
            ok &= lvl_ok

    # Final photometric residual at full resolution (occlusion guard).
    coords0 = pt[None, :] + win_offsets
    coords1 = coords0 + flow[None, :]
    resid = jnp.mean(
        jnp.abs(
            imops.bilinear_sample(next_pyr[0], coords1)
            - imops.bilinear_sample(prev_pyr[0], coords0)
        )
    )
    ok &= resid < max_residual
    return pt + flow, ok, resid


@functools.partial(
    jax.jit, static_argnames=("window", "num_iters")
)
def track_features(
    prev_pyr: Tuple[jnp.ndarray, ...],
    next_pyr: Tuple[jnp.ndarray, ...],
    pts: jnp.ndarray,  # (N, 2) f32 positions in the previous frame
    valid: jnp.ndarray,  # (N,) bool
    *,
    window: int = 15,
    num_iters: int = 20,
    eps: float = 0.01,
    min_eig_threshold: float = 1e-4,
    max_residual: float = 20.0,
):
    """Track a fixed-capacity table of features from prev to next frame.

    Returns (new_pts (N,2), tracked (N,) bool, residual (N,) f32).
    Invalid input slots come back invalid.
    """
    win_offsets = imops.window_coords(window)
    # Per-level gradients of the PREVIOUS frame (template side) — computed
    # once for the whole table, batched dense convs on the MXU/VPU.
    grads = tuple(imops.central_gradients(p) for p in prev_pyr)

    f = functools.partial(
        _track_point,
        prev_pyr,
        next_pyr,
        grads,
        win_offsets=win_offsets,
        num_iters=num_iters,
        eps=eps,
        min_eig_threshold=min_eig_threshold,
        max_residual=max_residual,
    )
    new_pts, ok, resid = jax.vmap(lambda p: f(pt=p))(pts)
    return new_pts, ok & valid, resid


def track_features_config(prev_pyr, next_pyr, pts, valid, cfg: KLTConfig):
    return track_features(
        prev_pyr, next_pyr, pts, valid,
        window=cfg.window,
        num_iters=cfg.num_iters,
        eps=cfg.eps,
        min_eig_threshold=cfg.min_eig_threshold,
        max_residual=cfg.max_residual,
    )

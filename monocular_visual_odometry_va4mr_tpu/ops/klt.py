"""Pyramidal Lucas-Kanade feature tracking, batched over a fixed feature table.

TPU-native replacement for ``cv2.calcOpticalFlowPyrLK`` (reference
VisualOdometryPipeLine.py:281,:287; params reference main.py:36-38: winSize
15x15, maxLevel 5/10, 50 iters / eps 0.01).

Performance design (SURVEY.md N4, "hard parts" #4 — KLT gather patterns):
  * A naive formulation samples 225 scattered pixels per feature per
    iteration — pathological for TPU gathers (measured 1.4 s/frame).  Here
    every window read is ONE contiguous (win+1)x(win+1) block per feature
    (vmapped ``lax.dynamic_slice`` -> XLA block gather of contiguous rows),
    and the sub-pixel window is a 4-term blend of the block's static shifts:
    the whole window shares a single fractional offset because LK flow is a
    pure translation.  All remaining math is dense (N, win, win) VPU work.
  * Classic inverse-style LK: the spatial gradient matrix G comes from the
    *previous* frame's window, computed once per level; iterations only
    re-read the current frame's block.
  * Fixed iteration count with a masked epsilon freeze instead of OpenCV's
    TERM_CRITERIA loop — same results, static shapes.

Status semantics mirror cv2: a track fails if the point leaves the image, the
gradient matrix is degenerate (min eigenvalue below ``min_eig_threshold``), or
the final photometric residual is large (occlusion guard).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core.config import KLTConfig
from . import image as imops


def _extract_blocks(img: jnp.ndarray, starts_yx: jnp.ndarray, size: int):
    """Gather one (size, size) block per row of starts (N, 2) [y, x] int32.

    Starts are clamped to the image so the slice is always in bounds; callers
    handle validity via masks."""
    H, W = img.shape
    y = jnp.clip(starts_yx[:, 0], 0, H - size)
    x = jnp.clip(starts_yx[:, 1], 0, W - size)

    def one(yy, xx):
        return lax.dynamic_slice(img, (yy, xx), (size, size))

    return jax.vmap(one)(y, x)


def _blend(block: jnp.ndarray, fx: jnp.ndarray, fy: jnp.ndarray, win: int):
    """Sub-pixel (win, win) window from a (win+1, win+1) block by bilinear
    blending of its four integer shifts; fx/fy are per-feature scalars."""
    fx = fx[:, None, None]
    fy = fy[:, None, None]
    b00 = block[:, :win, :win]
    b01 = block[:, :win, 1:]
    b10 = block[:, 1:, :win]
    b11 = block[:, 1:, 1:]
    return (
        b00 * (1 - fx) * (1 - fy)
        + b01 * fx * (1 - fy)
        + b10 * (1 - fx) * fy
        + b11 * fx * fy
    )


def _track_level_batch(
    prev_img, next_img, prev_gx, prev_gy,
    pts_l: jnp.ndarray,  # (N, 2) positions at this level
    guess: jnp.ndarray,  # (N, 2) incoming flow at this level
    win: int,
    num_iters: int,
    eps: float,
    min_eig_threshold: float,
):
    """One pyramid level of LK for the whole feature table."""
    H, W = prev_img.shape
    r = (win - 1) // 2
    size = win + 1
    # Edge-replicate padding so near-border windows sample replicated pixels
    # (like per-pixel clamping) instead of being shifted wholesale by the
    # block clamp.
    pad = r + 1
    prev_img = jnp.pad(prev_img, pad, mode="edge")
    next_img_p = jnp.pad(next_img, pad, mode="edge")
    prev_gx = jnp.pad(prev_gx, pad, mode="edge")
    prev_gy = jnp.pad(prev_gy, pad, mode="edge")

    base = jnp.floor(pts_l)
    frac = pts_l - base  # (N, 2) in [0, 1)
    starts = (base[:, ::-1] - r + pad).astype(jnp.int32)  # (N, 2) [y, x] padded

    T = _blend(_extract_blocks(prev_img, starts, size), frac[:, 0], frac[:, 1], win)
    Ix = _blend(_extract_blocks(prev_gx, starts, size), frac[:, 0], frac[:, 1], win)
    Iy = _blend(_extract_blocks(prev_gy, starts, size), frac[:, 0], frac[:, 1], win)

    gxx = jnp.sum(Ix * Ix, axis=(1, 2))
    gxy = jnp.sum(Ix * Iy, axis=(1, 2))
    gyy = jnp.sum(Iy * Iy, axis=(1, 2))
    det = gxx * gyy - gxy * gxy
    tr = gxx + gyy
    min_eig = 0.5 * (tr - jnp.sqrt(jnp.maximum(tr * tr - 4.0 * det, 0.0)))
    eig_ok = (min_eig / (win * win)) > min_eig_threshold
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)

    def body(_, carry):
        g, frozen = carry  # (N,2), (N,)
        q = pts_l + g
        qbase = jnp.floor(q)
        qfrac = q - qbase
        qstarts = (qbase[:, ::-1] - r + pad).astype(jnp.int32)
        cur = _blend(
            _extract_blocks(next_img_p, qstarts, size), qfrac[:, 0], qfrac[:, 1], win
        )
        diff = cur - T
        b0 = jnp.sum(diff * Ix, axis=(1, 2))
        b1 = jnp.sum(diff * Iy, axis=(1, 2))
        d0 = -(gyy * b0 - gxy * b1) * inv_det
        d1 = -(-gxy * b0 + gxx * b1) * inv_det
        d = jnp.stack([d0, d1], axis=-1)
        step_small = jnp.sum(d * d, axis=-1) < eps * eps
        g_new = jnp.where(frozen[:, None], g, g + d)
        return g_new, frozen | step_small

    flow, _ = lax.fori_loop(
        0, num_iters, body, (guess, jnp.zeros(pts_l.shape[0], bool))
    )

    p1 = pts_l + flow
    inb = (
        (p1[:, 0] >= r) & (p1[:, 0] <= W - 1 - r)
        & (p1[:, 1] >= r) & (p1[:, 1] <= H - 1 - r)
    )
    return flow, eig_ok, inb, T


@functools.partial(jax.jit, static_argnames=("window", "num_iters"))
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
    L = len(prev_pyr)
    N = pts.shape[0]
    grads = tuple(imops.central_gradients(p) for p in prev_pyr)

    flow = jnp.zeros_like(pts)
    ok = jnp.ones((N,), bool)
    for lvl in range(L - 1, -1, -1):
        scale = 0.5**lvl
        flow = flow * 2.0
        gx, gy = grads[lvl]
        flow, eig_ok, inb, T0 = _track_level_batch(
            prev_pyr[lvl], next_pyr[lvl], gx, gy, pts * scale, flow,
            window, num_iters, eps, min_eig_threshold,
        )
        if lvl == 0:
            # cv2 semantics: eig/bounds decide status only at the finest level
            # (coarse levels clamp).
            ok = ok & eig_ok & inb
            template0 = T0

    new_pts = pts + flow

    # Final photometric residual at full resolution (occlusion guard).
    r = (window - 1) // 2
    size = window + 1
    pad = r + 1
    next0 = jnp.pad(next_pyr[0], pad, mode="edge")
    qbase = jnp.floor(new_pts)
    qfrac = new_pts - qbase
    qstarts = (qbase[:, ::-1] - r + pad).astype(jnp.int32)
    cur = _blend(
        _extract_blocks(next0, qstarts, size), qfrac[:, 0], qfrac[:, 1],
        window,
    )
    resid = jnp.mean(jnp.abs(cur - template0), axis=(1, 2))
    ok = ok & (resid < max_residual)
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

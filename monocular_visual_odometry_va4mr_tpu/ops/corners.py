"""Shi-Tomasi / Harris corner detection with grid-cell NMS.

TPU-native replacement for ``cv2.goodFeaturesToTrack`` (reference
VisualOdometryPipeLine.py:256; params reference main.py:29-33: maxCorners
1400, qualityLevel 0.1/0.03, minDistance 10, blockSize 3, Shi-Tomasi).

Differences by design (SURVEY.md N3):
  * OpenCV's greedy sort-then-suppress NMS is inherently sequential; here the
    image is partitioned into ``min_dist``-sized cells, each cell keeps its
    best 3x3-local-max corner, and a global ``lax.top_k`` picks the final
    ``max_corners`` — one fixed-shape pass, no data-dependent loops.
  * Output is always (max_corners, 2) + validity mask (static shapes).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ..core.config import DetectorConfig
from . import image as imops


def corner_score(img: jnp.ndarray, block_size: int = 3, use_harris: bool = False,
                 harris_k: float = 0.04) -> jnp.ndarray:
    """Min-eigenvalue (Shi-Tomasi) or Harris response map, (H, W) f32.

    Relative magnitudes match cv2.cornerMinEigenVal / cornerHarris (the
    absolute scale differs by a constant factor, which cancels in the
    quality-level threshold)."""
    gx, gy = imops.sobel_gradients(img)
    # Structure tensor, box-averaged over block_size x block_size.
    a = imops.box_filter(gx * gx, block_size, normalize=True)
    b = imops.box_filter(gx * gy, block_size, normalize=True)
    c = imops.box_filter(gy * gy, block_size, normalize=True)
    if use_harris:
        det = a * c - b * b
        tr = a + c
        return det - harris_k * tr * tr
    half_tr = 0.5 * (a + c)
    half_diff = 0.5 * (a - c)
    return half_tr - jnp.sqrt(half_diff * half_diff + b * b)


def _local_max_3x3(score: jnp.ndarray) -> jnp.ndarray:
    """Boolean mask of 3x3 local maxima (ties keep the pixel, matching cv2's
    dilate-compare).  Shifted maxes fuse into one elementwise chain (TPU's
    reduce_window on a single channel lowers poorly)."""
    m = score
    for dy, dx in ((-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1),
                   (1, 0), (1, 1)):
        m = jnp.maximum(m, imops._shift(score, dy, dx))
    return score >= m


@functools.partial(jax.jit, static_argnames=("max_corners", "cell", "block_size",
                                             "use_harris"))
def detect_corners(
    img: jnp.ndarray,
    *,
    max_corners: int = 1400,
    quality_level: float = 0.1,
    cell: int = 10,
    block_size: int = 3,
    use_harris: bool = False,
    harris_k: float = 0.04,
    border: int = 4,
):
    """Detect up to ``max_corners`` corners on an (H, W) image.

    Returns:
      uv:    (max_corners, 2) f32 pixel coords (x, y), deterministic order
             (descending score).
      score: (max_corners,) f32.
      valid: (max_corners,) bool.
    """
    H, W = img.shape
    score = corner_score(img.astype(jnp.float32), block_size, use_harris, harris_k)
    is_max = _local_max_3x3(score)

    # Quality-level threshold relative to the global best. cv2 keeps only
    # strictly-positive responses above quality*max (THRESH_TOZERO + nonzero
    # collect), so a flat image yields zero corners.
    qmax = jnp.max(score)
    ok = is_max & (score > quality_level * qmax) & (score > 0.0)

    # Ignore a border strip (cv2 excludes a 1px border; we use the detector's
    # own support so windowed ops downstream stay in bounds).
    ys = lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = lax.broadcasted_iota(jnp.int32, (H, W), 1)
    inb = (xs >= border) & (xs < W - border) & (ys >= border) & (ys < H - border)
    ok &= inb

    neg = jnp.finfo(score.dtype).min
    masked = jnp.where(ok, score, neg)

    # Grid-cell reduction: one candidate per cell x cell block.
    Hp = -(-H // cell) * cell
    Wp = -(-W // cell) * cell
    padded = jnp.pad(masked, ((0, Hp - H), (0, Wp - W)), constant_values=neg)
    cells = padded.reshape(Hp // cell, cell, Wp // cell, cell).transpose(0, 2, 1, 3)
    cells = cells.reshape(Hp // cell, Wp // cell, cell * cell)
    cell_best = jnp.max(cells, axis=-1)
    cell_arg = jnp.argmax(cells, axis=-1)

    flat_scores = cell_best.reshape(-1)
    k = min(max_corners, flat_scores.shape[0])
    top_vals, top_idx = lax.top_k(flat_scores, k)

    n_cx = Wp // cell
    cy = top_idx // n_cx
    cx = top_idx % n_cx
    inner = cell_arg.reshape(-1)[top_idx]
    y = cy * cell + inner // cell
    x = cx * cell + inner % cell

    uv = jnp.stack([x, y], axis=-1).astype(jnp.float32)
    valid = top_vals > neg
    if k < max_corners:
        pad = max_corners - k
        uv = jnp.pad(uv, ((0, pad), (0, 0)))
        top_vals = jnp.pad(top_vals, (0, pad), constant_values=neg)
        valid = jnp.pad(valid, (0, pad))
    return uv, top_vals, valid


def detect_corners_config(img: jnp.ndarray, cfg: DetectorConfig, border: int = 4):
    return detect_corners(
        img,
        max_corners=cfg.max_corners,
        quality_level=cfg.quality_level,
        cell=int(cfg.min_dist),
        block_size=cfg.block_size,
        use_harris=cfg.use_harris,
        harris_k=cfg.harris_k,
        border=border,
    )

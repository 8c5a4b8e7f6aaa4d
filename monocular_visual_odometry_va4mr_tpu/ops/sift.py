"""DoG SIFT detector + descriptor in JAX (TPU-native re-design of
``cv2.SIFT_create().detectAndCompute``, reference VisualOdometryPipeLine.py:35,
:226-227; SURVEY.md N1).

Used only in the two-frame bootstrap (reference ``initial_feature_matching``),
so the design optimizes for correctness and fixed shapes over per-frame
latency: the dense scale-space / extrema stages are pure dense XLA; the
orientation and descriptor stages batch-gather fixed windows per keypoint
(acceptable at bootstrap frequency).

Fidelity vs OpenCV (tested for match quality rather than bit parity):
  * initial 2x upsampled octave (cv2's firstOctave=-1) — ``first_octave=-1``
    default, matching cv2.SIFT_create()'s default;
  * orientation/descriptor sampled from the Gaussian level nearest each
    keypoint's refined scale (cv2 semantics), not a shared mid-octave image;
  * secondary orientations: histogram peaks >= 0.8x the dominant peak emit a
    second keypoint at the same location (cv2 behavior, up to one extra);
  * one Newton step of subpixel refinement (cv2 iterates up to 5x; one step
    is within the match-quality tolerance the oracle tests enforce).
"""
from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core import linalg
from . import image as imops


class SiftFeatures(NamedTuple):
    uv: jnp.ndarray  # (K, 2) full-resolution pixel coords (x, y)
    scale: jnp.ndarray  # (K,) sigma in full-res pixels
    orientation: jnp.ndarray  # (K,) radians
    score: jnp.ndarray  # (K,) |DoG| contrast
    desc: jnp.ndarray  # (K, 128) L2-normalized descriptors
    valid: jnp.ndarray  # (K,) bool


def _scale_space(img: jnp.ndarray, num_octaves: int, s: int, sigma0: float,
                 first_octave: int = 0):
    """Gaussian pyramid: per octave, s+3 levels with sigma0 * 2^(l/s).

    ``first_octave=-1`` prepends a 2x bilinearly-upsampled octave (cv2's
    default firstOctave=-1): the input's assumed blur 0.5 becomes 1.0 after
    upsampling, so less extra blur is needed to reach sigma0.
    """
    if first_octave == -1:
        H, W = img.shape
        img = jax.image.resize(img, (2 * H, 2 * W), "linear")
        base_blur = 1.0
        num_octaves += 1
    else:
        base_blur = 0.5
    octaves = []
    base = imops.gaussian_blur(
        img, math.sqrt(max(sigma0**2 - base_blur**2, 0.01)))
    k = 2.0 ** (1.0 / s)
    for o in range(num_octaves):
        levels = [base]
        sig_prev = sigma0
        for l in range(1, s + 3):
            sig_total = sigma0 * (k**l)
            sig_extra = math.sqrt(sig_total**2 - sig_prev**2)
            levels.append(imops.gaussian_blur(levels[-1], sig_extra))
            sig_prev = sig_total
        octaves.append(levels)
        base = levels[s][::2, ::2]  # next octave seed at 2*sigma0
    return octaves


def _octave_extrema(dogs, s: int, contrast_thr: float, edge_thr: float,
                    per_octave: int):
    """Detect refined extrema in one octave's DoG stack.

    dogs: list of s+2 arrays (H, W). Returns fixed-size (per_octave, ...)
    candidate arrays: xy (x, y), level (float, refined), score, valid."""
    H, W = dogs[0].shape
    stack = jnp.stack(dogs)  # (s+2, H, W)
    L = stack.shape[0]

    def minmax3(x):
        mx = lax.reduce_window(x, -jnp.inf, lax.max, (3, 3, 3), (1, 1, 1), "SAME")
        mn = lax.reduce_window(x, jnp.inf, lax.min, (3, 3, 3), (1, 1, 1), "SAME")
        return mx, mn

    mx, mn = minmax3(stack)
    prelim = 0.5 * contrast_thr / s
    is_ext = ((stack >= mx) | (stack <= mn)) & (jnp.abs(stack) > prelim)

    # Spatial Hessian edge test.
    dxx = jnp.roll(stack, -1, 2) + jnp.roll(stack, 1, 2) - 2 * stack
    dyy = jnp.roll(stack, -1, 1) + jnp.roll(stack, 1, 1) - 2 * stack
    dxy = 0.25 * (
        jnp.roll(jnp.roll(stack, -1, 1), -1, 2)
        + jnp.roll(jnp.roll(stack, 1, 1), 1, 2)
        - jnp.roll(jnp.roll(stack, -1, 1), 1, 2)
        - jnp.roll(jnp.roll(stack, 1, 1), -1, 2)
    )
    tr = dxx + dyy
    det = dxx * dyy - dxy * dxy
    edge_ok = (det > 0) & (tr * tr / jnp.where(det > 0, det, 1.0)
                           < (edge_thr + 1.0) ** 2 / edge_thr)

    # Only interior levels/pixels can be keypoints.
    lvl_ids = lax.broadcasted_iota(jnp.int32, stack.shape, 0)
    ys = lax.broadcasted_iota(jnp.int32, stack.shape, 1)
    xs = lax.broadcasted_iota(jnp.int32, stack.shape, 2)
    border = 8
    interior = (
        (lvl_ids >= 1) & (lvl_ids <= L - 2)
        & (ys >= border) & (ys < H - border)
        & (xs >= border) & (xs < W - border)
    )
    cand = is_ext & edge_ok & interior

    score = jnp.where(cand, jnp.abs(stack), 0.0)
    flat = score.reshape(-1)
    k = min(per_octave, flat.shape[0])
    top_vals, top_idx = lax.top_k(flat, k)
    lvl = top_idx // (H * W)
    rem = top_idx % (H * W)
    y = rem // W
    x = rem % W

    # One Newton step of subpixel refinement: offset = -H3^-1 g.
    def refine(l, yy, xx):
        g = jnp.stack([
            0.5 * (stack[l, yy, xx + 1] - stack[l, yy, xx - 1]),
            0.5 * (stack[l, yy + 1, xx] - stack[l, yy - 1, xx]),
            0.5 * (stack[l + 1, yy, xx] - stack[l - 1, yy, xx]),
        ])
        hxx = dxx[l, yy, xx]
        hyy = dyy[l, yy, xx]
        hxy = dxy[l, yy, xx]
        hss = stack[l + 1, yy, xx] + stack[l - 1, yy, xx] - 2 * stack[l, yy, xx]
        hxs = 0.25 * (stack[l + 1, yy, xx + 1] - stack[l + 1, yy, xx - 1]
                      - stack[l - 1, yy, xx + 1] + stack[l - 1, yy, xx - 1])
        hys = 0.25 * (stack[l + 1, yy + 1, xx] - stack[l + 1, yy - 1, xx]
                      - stack[l - 1, yy + 1, xx] + stack[l - 1, yy - 1, xx])
        H3 = jnp.array([[hxx, hxy, hxs], [hxy, hyy, hys], [hxs, hys, hss]])
        off = -linalg.solve3(H3 + 1e-6 * jnp.eye(3), g)
        off = jnp.clip(off, -0.6, 0.6)
        contrast = stack[l, yy, xx] + 0.5 * jnp.dot(g, off)
        return off, contrast

    offs, contrasts = jax.vmap(refine)(lvl, y, x)
    valid = (top_vals > 0) & (jnp.abs(contrasts) >= contrast_thr / s)

    xy = jnp.stack([x + offs[:, 0], y + offs[:, 1]], axis=-1)
    level_f = lvl.astype(jnp.float32) + offs[:, 2]
    return xy, level_f, jnp.abs(contrasts), valid


def _orientation_and_descriptor(gauss: jnp.ndarray, xy: jnp.ndarray,
                                sigma_lvl: jnp.ndarray, valid: jnp.ndarray):
    """Dominant orientation + 4x4x8 descriptor for keypoints of ONE octave.

    gauss: (H, W) the Gaussian image nearest each keypoint's scale.
    xy: (K, 2) octave coords; sigma_lvl: (K,) sigma in octave pixels.

    Returns (theta1, theta2, has2, desc1, desc2): dominant + secondary
    orientation (cv2 emits an extra keypoint for every histogram peak
    >= 0.8x the dominant; we emit at most one) and a descriptor for each.
    """
    gx, gy = imops.central_gradients(gauss)
    mag = jnp.sqrt(gx * gx + gy * gy)
    ang = jnp.arctan2(gy, gx)  # [-pi, pi]

    R = 8  # half-window in "unit" grid; samples scaled by sigma
    grid = imops.window_coords(2 * R + 1)  # (289, 2) offsets in [-8, 8]

    def peak_theta(hist, b):
        # Parabolic peak interpolation around bin b.
        c0 = hist[(b - 1) % 36]
        c1 = hist[b]
        c2 = hist[(b + 1) % 36]
        denom = c0 - 2 * c1 + c2
        off = jnp.where(jnp.abs(denom) > 1e-9, 0.5 * (c0 - c2) / denom, 0.0)
        return ((b + off) / 36.0) * 2 * jnp.pi - jnp.pi

    def one_orientation(p, sig):
        coords = p[None, :] + grid * (0.75 * sig)
        m = imops.bilinear_sample(mag, coords)
        a = imops.bilinear_sample(ang, coords)
        w = jnp.exp(-jnp.sum((grid * 0.75) ** 2, -1) / (2 * (1.5**2)))
        bins = jnp.floor((a / (2 * jnp.pi) + 0.5) * 36).astype(jnp.int32) % 36
        hist = jnp.zeros(36).at[bins].add(m * w)
        # Smooth the circular histogram (cv2 smooths 6x; 2x suffices here).
        for _ in range(2):
            hist = (jnp.roll(hist, 1) + hist + jnp.roll(hist, -1)) / 3.0
        b = jnp.argmax(hist)
        theta1 = peak_theta(hist, b)
        # Secondary: largest OTHER local max >= 0.8x the dominant peak.
        is_peak = (hist > jnp.roll(hist, 1)) & (hist >= jnp.roll(hist, -1))
        others = jnp.where(
            is_peak & (jnp.arange(36) != b), hist, -jnp.inf)
        b2 = jnp.argmax(others)
        has2 = others[b2] >= 0.8 * hist[b]
        theta2 = peak_theta(hist, b2)
        return theta1, theta2, has2

    thetas, thetas2, has2 = jax.vmap(one_orientation)(xy, sigma_lvl)

    # Descriptor: 16x16 samples in the rotated frame, 4x4 cells x 8 bins.
    D = 16
    dgrid = (imops.window_coords(D) + 0.0)  # (256, 2) in [-7.5, 7.5]

    def one_desc(p, sig, theta):
        c, s_ = jnp.cos(theta), jnp.sin(theta)
        rot = jnp.array([[c, -s_], [s_, c]])
        coords = p[None, :] + (dgrid @ rot.T) * (0.4 * sig)
        m = imops.bilinear_sample(mag, coords)
        a = imops.bilinear_sample(ang, coords) - theta
        w = jnp.exp(-jnp.sum(dgrid**2, -1) / (2 * (0.5 * D) ** 2))
        mw = m * w

        # Trilinear soft-binning into (4, 4, 8).
        cell = (dgrid + 8.0) / 4.0 - 0.5  # cell coords in [-0.5, 3.5]
        cx = cell[:, 0]
        cy = cell[:, 1]
        ob = (a / (2 * jnp.pi) + 1.5) * 8.0  # orientation in bins (mod 8)

        desc = jnp.zeros((4, 4, 8))
        cx0 = jnp.floor(cx)
        cy0 = jnp.floor(cy)
        ob0 = jnp.floor(ob)
        for dxc in (0, 1):
            for dyc in (0, 1):
                for dob in (0, 1):
                    wx = jnp.where(dxc == 0, 1 - (cx - cx0), cx - cx0)
                    wy = jnp.where(dyc == 0, 1 - (cy - cy0), cy - cy0)
                    wo = jnp.where(dob == 0, 1 - (ob - ob0), ob - ob0)
                    ix = jnp.clip(cx0 + dxc, 0, 3).astype(jnp.int32)
                    iy = jnp.clip(cy0 + dyc, 0, 3).astype(jnp.int32)
                    io = (ob0.astype(jnp.int32) + dob) % 8
                    inside = (cx0 + dxc >= 0) & (cx0 + dxc <= 3) & \
                             (cy0 + dyc >= 0) & (cy0 + dyc <= 3)
                    desc = desc.at[iy, ix, io].add(
                        jnp.where(inside, mw * wx * wy * wo, 0.0)
                    )
        v = desc.reshape(128)
        v = v / jnp.maximum(jnp.linalg.norm(v), 1e-9)
        v = jnp.clip(v, 0.0, 0.2)
        v = v / jnp.maximum(jnp.linalg.norm(v), 1e-9)
        return v

    descs = jax.vmap(one_desc)(xy, sigma_lvl, thetas)
    descs2 = jax.vmap(one_desc)(xy, sigma_lvl, thetas2)
    return thetas, thetas2, has2, descs, descs2


def _orientation_and_descriptor_multi(levels, xy, level_f, sigma_lvl, s):
    """Per-keypoint nearest-scale Gaussian selection (cv2 semantics).

    Runs the orientation+descriptor stage against each interior Gaussian
    level and gathers, per keypoint, the result from the level nearest its
    refined DoG level.  Dense per-level compute keeps shapes static (the
    per-keypoint alternative — a dynamic (H, W) slice gather per keypoint —
    would blow HBM); SIFT runs only at bootstrap so the s-fold cost is off
    the steady-state path.
    """
    li = jnp.clip(jnp.round(level_f).astype(jnp.int32), 1, s)
    parts = [_orientation_and_descriptor(levels[l], xy, sigma_lvl, None)
             for l in range(1, s + 1)]
    stacked = [jnp.stack([p[i] for p in parts]) for i in range(5)]
    sel = li - 1  # (K,) index into the stacked level axis

    def pick(arr):
        idx = sel.reshape((-1,) + (1,) * (arr.ndim - 2))
        return jnp.take_along_axis(arr, idx[None], axis=0)[0]

    return tuple(pick(a) for a in stacked)


@functools.partial(
    jax.jit,
    static_argnames=("max_features", "num_octaves", "scales_per_octave",
                     "contrast_threshold", "edge_threshold", "sigma",
                     "first_octave"),
)
def detect_and_compute(
    img: jnp.ndarray,
    *,
    max_features: int = 2048,
    num_octaves: int = 4,
    scales_per_octave: int = 3,
    contrast_threshold: float = 0.04,
    edge_threshold: float = 10.0,
    sigma: float = 1.6,
    first_octave: int = -1,
) -> SiftFeatures:
    """SIFT keypoints + descriptors with fixed output shapes."""
    # _scale_space only implements the 2x-upsampled (-1) and native (0)
    # first octaves; any other value would silently misalign coordinates
    # against the pyramid (advisor r3).  Static arg, so a plain assert.
    assert first_octave in (-1, 0), (
        f"first_octave must be -1 or 0, got {first_octave}")
    img = img.astype(jnp.float32) / 255.0
    s = scales_per_octave
    octaves = _scale_space(img, num_octaves, s, sigma, first_octave)

    per_octave = max_features // 2
    all_parts = []
    for o, levels in enumerate(octaves):
        dogs = [levels[i + 1] - levels[i] for i in range(len(levels) - 1)]
        xy, level_f, score, valid = _octave_extrema(
            dogs, s, contrast_threshold, edge_threshold, per_octave
        )
        sigma_lvl = sigma * (2.0 ** (level_f / s))  # octave pixels
        theta, theta2, has2, desc, desc2 = _orientation_and_descriptor_multi(
            levels, xy, level_f, sigma_lvl, s
        )
        factor = float(2 ** (o + first_octave))
        all_parts.append(
            (xy * factor, sigma_lvl * factor, theta, score, desc, valid)
        )
        # Secondary-orientation keypoints (same location/scale/score; cv2
        # emits them as separate keypoints).  Scored epsilon lower so the
        # global top-K prefers dominant orientations under budget pressure.
        all_parts.append(
            (xy * factor, sigma_lvl * factor, theta2,
             jnp.where(has2, score * (1.0 - 1e-6), 0.0), desc2,
             valid & has2)
        )

    uv = jnp.concatenate([p[0] for p in all_parts])
    scale = jnp.concatenate([p[1] for p in all_parts])
    theta = jnp.concatenate([p[2] for p in all_parts])
    score = jnp.concatenate([p[3] for p in all_parts])
    desc = jnp.concatenate([p[4] for p in all_parts])
    valid = jnp.concatenate([p[5] for p in all_parts])

    masked = jnp.where(valid, score, -1.0)
    top_vals, top_idx = lax.top_k(masked, max_features)
    return SiftFeatures(
        uv=uv[top_idx],
        scale=scale[top_idx],
        orientation=theta[top_idx],
        score=top_vals,
        desc=desc[top_idx],
        valid=top_vals > 0,
    )

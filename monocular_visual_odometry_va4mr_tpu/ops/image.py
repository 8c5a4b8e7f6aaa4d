"""Dense image ops: separable Gaussian blur, image pyramids, gradients,
bilinear sampling.

These are the shared substrate for the corner detector (ops/corners.py,
replacing ``cv2.goodFeaturesToTrack``, reference VisualOdometryPipeLine.py:256),
the pyramidal KLT tracker (ops/klt.py, replacing ``cv2.calcOpticalFlowPyrLK``,
reference :281,:287) and SIFT (ops/sift.py, replacing ``cv2.SIFT``, :226-227).

Everything is expressed as XLA-friendly dense convolutions / gathers on f32
images of static shape; XLA fuses the elementwise chains and maps the convs
onto the MXU where profitable.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def gaussian_kernel_1d(sigma: float, radius: int | None = None) -> jnp.ndarray:
    """Normalized 1-D Gaussian taps (static length)."""
    if radius is None:
        radius = max(1, int(3.0 * sigma + 0.5))
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def _conv_sep(img: jnp.ndarray, kx: jnp.ndarray, ky: jnp.ndarray) -> jnp.ndarray:
    """Separable 2-D convolution with SAME (edge-replicate) padding.

    img: (H, W) f32.  Edge replication matches OpenCV's default
    BORDER_REFLECT_101 closely enough for interior pixels; tests compare
    interiors only.
    """
    rx = kx.shape[0] // 2
    ry = ky.shape[0] // 2
    img_p = jnp.pad(img, ((ry, ry), (rx, rx)), mode="edge")
    x = img_p[None, None]  # NCHW
    wy = ky.reshape(1, 1, -1, 1)
    wx = kx.reshape(1, 1, 1, -1)
    x = lax.conv_general_dilated(x, wy, (1, 1), "VALID")
    x = lax.conv_general_dilated(x, wx, (1, 1), "VALID")
    return x[0, 0]


def gaussian_blur(img: jnp.ndarray, sigma: float, radius: int | None = None) -> jnp.ndarray:
    k = gaussian_kernel_1d(sigma, radius)
    return _conv_sep(img, k, k)


def _shift(img: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Edge-replicated shift: out[y, x] = img[y+dy, x+dx] (clamped)."""
    H, W = img.shape
    if dy > 0:
        img = jnp.concatenate([img[dy:], jnp.repeat(img[-1:], dy, 0)], 0)
    elif dy < 0:
        img = jnp.concatenate([jnp.repeat(img[:1], -dy, 0), img[:dy]], 0)
    if dx > 0:
        img = jnp.concatenate([img[:, dx:], jnp.repeat(img[:, -1:], dx, 1)], 1)
    elif dx < 0:
        img = jnp.concatenate([jnp.repeat(img[:, :1], -dx, 1), img[:, :dx]], 1)
    return img


def sobel_gradients(img: jnp.ndarray):
    """Sobel x/y gradients with OpenCV's 3x3 kernels.

    Implemented as shift-adds: XLA lowers single-channel convs on TPU very
    poorly (measured ~10x slower than the fused elementwise chain).
    """
    up, down = _shift(img, -1, 0), _shift(img, 1, 0)
    sy = up + 2.0 * img + down  # vertical smooth
    gx = _shift(sy, 0, 1) - _shift(sy, 0, -1)
    left, right = _shift(img, 0, -1), _shift(img, 0, 1)
    sx = left + 2.0 * img + right
    gy = _shift(sx, 1, 0) - _shift(sx, -1, 0)
    return gx, gy


def scharr_gradients(img: jnp.ndarray):
    """Scharr 3x3 gradients (what cv2.calcOpticalFlowPyrLK uses internally,
    scaled by 1/32)."""
    smooth = jnp.array([3.0, 10.0, 3.0], jnp.float32) / 32.0
    diff = jnp.array([-1.0, 0.0, 1.0], jnp.float32)
    gx = _conv_sep(img, diff, smooth)
    gy = _conv_sep(img, smooth, diff)
    return gx, gy


def central_gradients(img: jnp.ndarray):
    """Simple central-difference gradients (used by the KLT tracker)."""
    gx = 0.5 * (_shift(img, 0, 1) - _shift(img, 0, -1))
    gy = 0.5 * (_shift(img, 1, 0) - _shift(img, -1, 0))
    return gx, gy


def box_filter(img: jnp.ndarray, size: int, normalize: bool = False) -> jnp.ndarray:
    """size x size box sum (or mean) with edge-replicate SAME padding.

    Shift-add formulation for small sizes (fuses into one elementwise chain
    on TPU); conv fallback for large windows."""
    if size <= 7:
        r = size // 2
        acc_y = img
        for d in range(1, r + 1):
            acc_y = acc_y + _shift(img, d, 0) + _shift(img, -d, 0)
        acc = acc_y
        for d in range(1, r + 1):
            acc = acc + _shift(acc_y, 0, d) + _shift(acc_y, 0, -d)
        if normalize:
            acc = acc / (size * size)
        return acc
    k = jnp.ones((size,), jnp.float32)
    if normalize:
        k = k / size
    return _conv_sep(img, k, k)


def pyr_down(img: jnp.ndarray) -> jnp.ndarray:
    """Half-resolution downsample with the cv2.pyrDown 5-tap binomial filter."""
    k = jnp.array([1.0, 4.0, 6.0, 4.0, 1.0], jnp.float32) / 16.0
    blurred = _conv_sep(img, k, k)
    return blurred[::2, ::2]


@functools.partial(jax.jit, static_argnames=("num_levels",))
def build_pyramid(img: jnp.ndarray, num_levels: int):
    """Gaussian pyramid: level 0 = input, level l = pyr_down^l.

    Matches the pyramid cv2.calcOpticalFlowPyrLK builds for ``maxLevel``
    (reference main.py:37 maxLevel 5/10 — capped so the smallest level is
    still larger than the tracking window)."""
    levels = [img.astype(jnp.float32)]
    for _ in range(num_levels - 1):
        levels.append(pyr_down(levels[-1]))
    return tuple(levels)


@functools.partial(jax.jit, static_argnames=("factor", "mid_factor"))
def build_flat_pyramid(img: jnp.ndarray, factor: int = 16,
                       mid_factor: int = 4):
    """Flat pyramid (full res, 1/mid_factor, 1/factor box-averaged) — what
    the Pallas tracker chain needs (full-res LK + quarter-res LK + coarse
    prior volume), at a fraction of the Gaussian chain's cost."""
    img = img.astype(jnp.float32)
    H, W = img.shape

    def down(x, f):
        h = x.shape[0] - x.shape[0] % f
        w = x.shape[1] - x.shape[1] % f
        return x[:h, :w].reshape(h // f, f, w // f, f).mean(axis=(1, 3))

    mid = down(img, mid_factor)
    coarse = down(mid, factor // mid_factor) if factor % mid_factor == 0 \
        else down(img, factor)
    return (img, mid, coarse)


def bilinear_sample(img: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Bilinear interpolation of (H, W) image at (..., 2) pixel coords (x, y).

    Out-of-bounds coordinates clamp to the border (callers carry explicit
    in-bounds masks for validity decisions)."""
    H, W = img.shape
    x = jnp.clip(uv[..., 0], 0.0, W - 1.000001)
    y = jnp.clip(uv[..., 1], 0.0, H - 1.000001)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, W - 1)
    y1i = jnp.minimum(y0i + 1, H - 1)
    v00 = img[y0i, x0i]
    v01 = img[y0i, x1i]
    v10 = img[y1i, x0i]
    v11 = img[y1i, x1i]
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


def window_coords(window: int) -> jnp.ndarray:
    """(window*window, 2) relative (dx, dy) offsets centered on 0."""
    r = (window - 1) / 2.0
    ax = jnp.arange(window, dtype=jnp.float32) - r
    dx, dy = jnp.meshgrid(ax, ax, indexing="xy")
    return jnp.stack([dx.ravel(), dy.ravel()], axis=-1)

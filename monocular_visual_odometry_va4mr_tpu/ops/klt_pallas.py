"""TPU-native KLT: dense coarse-flow prior + single-level Pallas patch LK.

Replaces the multi-level gather-based tracker for the hot path.  Rationale
(measured on v5e): XLA gathers cost ~2-3 us per slice regardless of size, so
any per-feature-per-iteration image access is unusable (the straight pyramidal
port ran 450 ms/frame).  This design does exactly ONE DMA per feature per
frame and keeps everything else dense or in VMEM:

 1. ``coarse_flow_volume``: a dense integer-displacement SSD cost volume at
    pyramid level ``COARSE_LEVEL`` (1/16 res), range +-R coarse px (+-R*16 px
    full-res), with parabolic sub-pixel refinement — pure dense XLA
    (shift + multiply + separable box sums), no warping, no gathers.
 2. The per-feature flow *prior* is sampled from that tiny map with one-hot
    matmuls (MXU) — no gathers.
 3. ``_klt_kernel`` (Pallas): per feature, one DMA of a stacked
    (2, ROWS, 256) slab — template rows from the previous frame and search
    rows from the current frame share one aligned copy — then classic
    inverse-style LK iterations run entirely in VMEM using traced sublane
    slices + dynamic lane rolls (the two per-feature-addressing primitives
    Mosaic supports).  Status (min-eig, convergence, in-bounds, photometric
    residual) is computed in-kernel.

Equivalent of ``cv2.calcOpticalFlowPyrLK`` (reference
VisualOdometryPipeLine.py:281,:287) under the VO regime: the coarse volume
covers the large motions the reference's 5-10 pyramid levels were for, and
the full-res LK supplies cv2-grade sub-pixel accuracy.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import image as imops

# --- static geometry of the kernel ---
WIN = 15  # tracking window (reference main.py:36 winSize)
ROWS = 48  # slab rows (window + vertical drift margin)
LANES = 256  # slab lanes (two 128-lane tiles; horizontal drift margin)
BF = 8  # features per Pallas program
COARSE_LEVEL = 4  # 1/16 resolution for the prior volume
COARSE_RANGE = 10  # +-10 coarse px -> +-160 full-res px motion coverage


# ---------------------------------------------------------------------------
# Dense coarse prior
# ---------------------------------------------------------------------------

def coarse_flow_volume(i0: jnp.ndarray, i1: jnp.ndarray,
                       rng: int = COARSE_RANGE, win: int = 5):
    """Dense integer flow at the input resolution via an SSD cost volume.

    Returns flow (H, W, 2) f32 in pixels of the input images, refined to
    sub-pixel by a 1-D parabola fit around the argmin in x and y.

    The (2*rng+1)^2 shifted squared-diff maps are box-summed with ONE
    batched separable conv (441 single-channel convs lowered abysmally).
    """
    H, W = i0.shape
    D = 2 * rng + 1
    pad = rng + 1
    i1p = jnp.pad(i1, pad, mode="edge")

    diffs = jnp.stack(
        [
            (lax.dynamic_slice(i1p, (pad + dy, pad + dx), (H, W)) - i0) ** 2
            for dy in range(-rng, rng + 1)
            for dx in range(-rng, rng + 1)
        ]
    )  # (D*D, H, W)
    r = win // 2
    dp = jnp.pad(diffs, ((0, 0), (r, r), (r, r)))
    k = jnp.ones((win,), jnp.float32)
    x1 = lax.conv_general_dilated(
        dp[:, None], k.reshape(1, 1, -1, 1), (1, 1), "VALID")
    costs = lax.conv_general_dilated(
        x1, k.reshape(1, 1, 1, -1), (1, 1), "VALID")[:, 0]  # (D*D, H, W)

    best = jnp.argmin(costs, axis=0)  # (H, W)
    by = best // D
    bx = best % D

    # Parabola refinement needs the cost at the argmin's 4 axis neighbors.
    # Gather along the leading axis with take_along_axis (dense, minor axis).
    def take(idx):
        idx = jnp.clip(idx, 0, D * D - 1)
        return jnp.take_along_axis(costs, idx[None], axis=0)[0]

    c0 = take(best)
    cxm = take(jnp.where(bx > 0, best - 1, best))
    cxp = take(jnp.where(bx < D - 1, best + 1, best))
    cym = take(jnp.where(by > 0, best - D, best))
    cyp = take(jnp.where(by < D - 1, best + D, best))

    def parab(cm, c, cp):
        denom = cm - 2 * c + cp
        off = jnp.where(jnp.abs(denom) > 1e-6, 0.5 * (cm - cp) / denom, 0.0)
        return jnp.clip(off, -0.5, 0.5)

    fx = (bx - rng).astype(jnp.float32) + parab(cxm, c0, cxp)
    fy = (by - rng).astype(jnp.float32) + parab(cym, c0, cyp)
    return jnp.stack([fx, fy], axis=-1)


def sample_map_onehot(fmap: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Bilinear-sample a small (h, w, C) map at (N, 2) [x, y] positions using
    one-hot matmuls (MXU) — no gathers."""
    h, w, C = fmap.shape
    x = jnp.clip(pts[:, 0], 0.0, w - 1.001)
    y = jnp.clip(pts[:, 1], 0.0, h - 1.001)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]

    def row_sel(yi):  # (N, h)
        return jax.nn.one_hot(yi.astype(jnp.int32), h, dtype=jnp.float32)

    def col_sel(xi):  # (N, w)
        return jax.nn.one_hot(xi.astype(jnp.int32), w, dtype=jnp.float32)

    flat = fmap.reshape(h, w * C)

    def sample_int(yi, xi):
        rows = row_sel(yi) @ flat  # (N, w*C)
        rows = rows.reshape(-1, w, C)
        return jnp.einsum("nwc,nw->nc", rows, col_sel(xi))

    v00 = sample_int(y0, x0)
    v01 = sample_int(y0, x0 + 1)
    v10 = sample_int(y0 + 1, x0)
    v11 = sample_int(y0 + 1, x0 + 1)
    return (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
            + v10 * (1 - fx) * fy + v11 * fx * fy)


# ---------------------------------------------------------------------------
# Pallas LK kernel
# ---------------------------------------------------------------------------

def _klt_kernel(meta_ref, stacked_ref, out_ref, slab, sems, *, num_iters,
                eps, min_eig_threshold, max_residual, img_h, img_w):
    """Per-program: BF features. meta_ref (SMEM) rows:
    [py, px, qy, qx, valid] with q = predicted position in the new frame.
    stacked_ref: (2, Hp, Wp) HBM — edge-padded prev/next images.
    out_ref (SMEM): (BF, 8): [new_x, new_y, ok, resid, min_eig, 0, 0, 0].
    slab: VMEM (BF, 2, ROWS, LANES); sems: DMA semaphores (BF,).
    """
    r = (WIN - 1) // 2
    PAD = 16  # images are pre-padded by PAD top/left (+ alignment right/bottom)
    Hp = stacked_ref.shape[1]  # padded dims; Hp % 8 == 0, Wp % 128 == 0
    Wp = stacked_ref.shape[2]

    def slab_base(f):
        py = meta_ref[f, 0]
        qy = meta_ref[f, 2]
        px = meta_ref[f, 1]
        qx = meta_ref[f, 3]
        ymin = jnp.minimum(py, qy)
        # row base: 8-aligned, centered-ish on the template/search rows
        y0 = (jnp.floor(ymin).astype(jnp.int32) + PAD - 12) // 8 * 8
        y0 = jnp.clip(y0, 0, Hp - ROWS)
        xmin = jnp.minimum(px, qx)
        x0 = (jnp.floor(xmin).astype(jnp.int32) + PAD - 96) // 128 * 128
        x0 = jnp.clip(x0, 0, Wp - LANES)
        # Alignment facts Mosaic can't derive across the clip.
        return pl.multiple_of(y0, 8), pl.multiple_of(x0, 128)

    # Start all DMAs first (pipelined), then process.
    def start_dma(f, _):
        y0, x0 = slab_base(f)
        pltpu.make_async_copy(
            stacked_ref.at[:, pl.ds(y0, ROWS), pl.ds(x0, LANES)],
            slab.at[f],
            sems.at[f],
        ).start()
        return 0

    lax.fori_loop(0, BF, start_dma, 0)

    WB = 24  # aligned load rows (WIN+1 rows + up-to-7 sublane offset + grads)
    row_ids = lax.broadcasted_iota(jnp.int32, (16, 128), 0)
    col_ids = lax.broadcasted_iota(jnp.int32, (16, 128), 1)
    wmask = ((row_ids < WIN) & (col_ids < WIN)).astype(jnp.float32)

    def load_aligned(f, p, y, x):
        """(WB, 128) rows of slab plane (f, p) re-registered so integer
        position (y, x) sits at element (0, 0); returns (rows, fy, fx)."""
        yi = jnp.floor(y).astype(jnp.int32)
        xi = jnp.floor(x).astype(jnp.int32)
        fy = y - jnp.floor(y)
        fx = x - jnp.floor(x)
        yi = jnp.clip(yi, 0, ROWS - WIN - 2)
        xi = jnp.clip(xi, 0, LANES - WIN - 2)
        # Sublane loads must be 8-aligned: load at the aligned base, then
        # roll the residue away (dynamic sublane rotate).
        yi8 = pl.multiple_of((yi // 8) * 8, 8)
        sub = yi - yi8  # 0..7
        rows = slab[f, p, pl.ds(yi8, WB), :]
        # pltpu.roll requires non-negative shifts; roll is circular.
        rows = pltpu.roll(rows, WB - sub, 0)  # shift rows up by sub
        rows = pltpu.roll(rows, LANES - xi, 1)  # lane shift left by xi
        return rows, fy, fx

    def blend16(rows, fy, fx):
        """(16, 128) bilinear window from re-registered (WB, LANES) rows."""
        left1 = pltpu.roll(rows, LANES - 1, 1)  # x + 1
        up1 = pltpu.roll(rows, WB - 1, 0)  # y + 1
        r00 = rows[:16, :128]
        r01 = left1[:16, :128]
        r10 = up1[:16, :128]
        r11 = pltpu.roll(up1, LANES - 1, 1)[:16, :128]
        return (
            r00 * (1 - fx) * (1 - fy) + r01 * fx * (1 - fy)
            + r10 * (1 - fx) * fy + r11 * fx * fy
        )

    def window_at(f, p, y, x):
        rows, fy, fx = load_aligned(f, p, y, x)
        return blend16(rows, fy, fx)

    def process(f, _):
        y0, x0 = slab_base(f)
        pltpu.make_async_copy(
            stacked_ref.at[:, pl.ds(y0, ROWS), pl.ds(x0, LANES)],
            slab.at[f],
            sems.at[f],
        ).wait()

        py = meta_ref[f, 0]
        px = meta_ref[f, 1]
        qy = meta_ref[f, 2]
        qx = meta_ref[f, 3]
        y0f = y0.astype(jnp.float32) - PAD  # slab origin in image coords
        x0f = x0.astype(jnp.float32) - PAD

        # Template window + gradients, all from ONE re-registered load: the
        # +-1 sample positions are circular rolls of the same rows.
        ty = py - r - y0f
        tx = px - r - x0f
        rows_t, tfy, tfx = load_aligned(f, 0, ty, tx)
        T = blend16(rows_t, tfy, tfx) * wmask
        Txp = blend16(pltpu.roll(rows_t, LANES - 1, 1), tfy, tfx)
        Txm = blend16(pltpu.roll(rows_t, 1, 1), tfy, tfx)
        Typ = blend16(pltpu.roll(rows_t, WB - 1, 0), tfy, tfx)
        Tym = blend16(pltpu.roll(rows_t, 1, 0), tfy, tfx)
        Ix = (Txp - Txm) * 0.5 * wmask
        Iy = (Typ - Tym) * 0.5 * wmask

        gxx = jnp.sum(Ix * Ix)
        gxy = jnp.sum(Ix * Iy)
        gyy = jnp.sum(Iy * Iy)
        det = gxx * gyy - gxy * gxy
        tr = gxx + gyy
        min_eig = 0.5 * (tr - jnp.sqrt(jnp.maximum(tr * tr - 4.0 * det, 0.0)))
        inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)

        def body(_, carry):
            gx_, gy_, frozen = carry
            cur = window_at(f, 1, qy + gy_ - r - y0f,
                            qx + gx_ - r - x0f) * wmask
            diff = cur - T
            b0 = jnp.sum(diff * Ix)
            b1 = jnp.sum(diff * Iy)
            d0 = -(gyy * b0 - gxy * b1) * inv_det
            d1 = -(-gxy * b0 + gxx * b1) * inv_det
            small = (d0 * d0 + d1 * d1) < eps * eps
            gx_n = jnp.where(frozen, gx_, gx_ + d0)
            gy_n = jnp.where(frozen, gy_, gy_ + d1)
            return gx_n, gy_n, frozen | small

        gx_f, gy_f, converged = lax.fori_loop(
            0, num_iters, body, (jnp.float32(0.0), jnp.float32(0.0),
                                 jnp.array(False))
        )

        new_x = qx + gx_f
        new_y = qy + gy_f

        cur = window_at(f, 1, new_y - r - y0f, new_x - r - x0f) * wmask
        resid = jnp.sum(jnp.abs(cur - T)) / (WIN * WIN)

        inb = ((new_x >= r) & (new_x <= img_w - 1 - r)
               & (new_y >= r) & (new_y <= img_h - 1 - r))
        # Solution must stay inside the slab's representable area.
        in_slab = ((new_x - r - x0f >= 0) & (new_x - r - x0f < LANES - WIN - 1)
                   & (new_y - r - y0f >= 0) & (new_y - r - y0f < ROWS - WIN - 1))
        eig_ok = (min_eig / (WIN * WIN)) > min_eig_threshold
        ok = (inb & in_slab & eig_ok & (resid < max_residual)
              & (meta_ref[f, 4] > 0.5))

        out_ref[f, 0] = new_x
        out_ref[f, 1] = new_y
        out_ref[f, 2] = jnp.where(ok, 1.0, 0.0)
        out_ref[f, 3] = resid
        out_ref[f, 4] = min_eig
        out_ref[f, 5] = 0.0
        out_ref[f, 6] = 0.0
        out_ref[f, 7] = 0.0
        return 0

    lax.fori_loop(0, BF, process, 0)


@functools.partial(
    jax.jit,
    static_argnames=("num_iters", "eps", "min_eig_threshold", "max_residual",
                     "img_h", "img_w", "interpret"),
)
def _run_klt_kernel(stacked_padded, meta, *, num_iters, eps,
                    min_eig_threshold, max_residual, img_h, img_w,
                    interpret=False):
    N = meta.shape[0]
    kernel = functools.partial(
        _klt_kernel, num_iters=num_iters, eps=eps,
        min_eig_threshold=min_eig_threshold, max_residual=max_residual,
        img_h=img_h, img_w=img_w,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, 8), jnp.float32),
        grid=(N // BF,),
        in_specs=[
            pl.BlockSpec((BF, 5), lambda g: (g, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((BF, 8), lambda g: (g, 0),
                               memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((BF, 2, ROWS, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((BF,)),
        ],
        interpret=interpret,
    )(meta, stacked_padded)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("num_iters", "eps", "min_eig_threshold", "max_residual",
                     "interpret"),
)
def track_features_pallas(
    prev_pyr: Tuple[jnp.ndarray, ...],
    next_pyr: Tuple[jnp.ndarray, ...],
    pts: jnp.ndarray,  # (N, 2) [x, y] positions in the previous frame
    valid: jnp.ndarray,  # (N,) bool
    *,
    num_iters: int = 10,
    eps: float = 0.01,
    min_eig_threshold: float = 1e-4,
    max_residual: float = 20.0,
    prior: jnp.ndarray = None,
    interpret: bool = False,
):
    """Drop-in equivalent of klt.track_features using the Pallas tracker.

    The pyramid tuples only need levels [0] and [COARSE_LEVEL] (build_pyramid
    output works).  N must be a multiple of BF (pad the table).

    ``prior``: optional (N, 2) per-feature flow prior in px of the level-0
    images; when given, the internal coarse-volume prior is skipped (the
    multi-level chain in klt_pallas2.track_multilevel supplies a refined
    prior from the quarter-resolution pass).
    """
    i0 = prev_pyr[0]
    i1 = next_pyr[0]
    H, W = i0.shape
    if prior is None:
        # Coarse prior level: deepest available level at or above
        # COARSE_LEVEL's reduction; scale inferred from shapes so 2-level
        # (full, /16) pyramids from avg-pooling work the same as full
        # Gaussian pyramids.
        coarse_prev = prev_pyr[min(COARSE_LEVEL, len(prev_pyr) - 1)]
        coarse_next = next_pyr[min(COARSE_LEVEL, len(next_pyr) - 1)]
        scale = float(round(H / coarse_prev.shape[0]))

        flow_c = coarse_flow_volume(coarse_prev, coarse_next)  # (h, w, 2)
        pred = sample_map_onehot(flow_c, pts / scale) * scale  # (N, 2) px
    else:
        pred = prior

    q = pts + pred
    meta = jnp.concatenate(
        [pts[:, 1:2], pts[:, 0:1], q[:, 1:2], q[:, 0:1],
         valid[:, None].astype(jnp.float32)], axis=1,
    )

    # Pad PAD px top/left (border sampling), then bottom/right so Hp % 8 == 0
    # and Wp % 128 == 0 — keeps every clipped slab base aligned for DMA.
    PAD = 16
    Hp = -(-(H + 2 * PAD) // 8) * 8
    Wp = -(-(W + 2 * PAD) // 128) * 128
    Hp = max(Hp, ROWS)
    Wp = max(Wp, LANES)

    def pad_img(img):
        img = jnp.pad(img, ((PAD, Hp - H - PAD), (PAD, Wp - W - PAD)),
                      mode="edge")
        return img

    stacked = jnp.stack([pad_img(i0), pad_img(i1)])

    out = _run_klt_kernel(
        stacked, meta, num_iters=num_iters, eps=eps,
        min_eig_threshold=min_eig_threshold, max_residual=max_residual,
        img_h=H, img_w=W, interpret=interpret,
    )
    new_pts = jnp.stack([out[:, 0], out[:, 1]], axis=-1)
    ok = (out[:, 2] > 0.5) & valid
    return new_pts, ok, out[:, 3]

"""Brute-force descriptor matching with Lowe ratio test — one fused MXU pass.

TPU-native replacement for ``cv2.BFMatcher().knnMatch(k=2)`` + the Python
ratio-test loop (reference VisualOdometryPipeLine.py:36,:218-224,:229;
SURVEY.md N2): the full squared-distance matrix is one matmul
(|a|^2 + |b|^2 - 2 a.b^T), the 2-NN comes from ``lax.top_k`` per row, and the
ratio test is a masked compare — no Python loops, fixed (N0,) outputs.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


@functools.partial(jax.jit, static_argnames=("cross_check",))
def match_ratio(
    desc0: jnp.ndarray,  # (N0, D)
    valid0: jnp.ndarray,  # (N0,)
    desc1: jnp.ndarray,  # (N1, D)
    valid1: jnp.ndarray,  # (N1,)
    *,
    ratio: float = 0.8,
    cross_check: bool = False,
):
    """Returns (idx1 (N0,) int32, ok (N0,) bool): for each valid row of desc0,
    its ratio-test-passing nearest neighbor in desc1."""
    big = jnp.float32(1e12)
    d2 = (
        jnp.sum(desc0**2, -1, keepdims=True)
        - 2.0 * desc0 @ desc1.T
        + jnp.sum(desc1**2, -1)[None, :]
    )  # (N0, N1) on the MXU
    d2 = jnp.where(valid1[None, :], d2, big)

    neg_top2, idx_top2 = lax.top_k(-d2, 2)
    best = -neg_top2[:, 0]
    second = -neg_top2[:, 1]
    idx1 = idx_top2[:, 0].astype(jnp.int32)

    ok = valid0 & (best < ratio * ratio * second) & (best < big)

    if cross_check:
        d2b = jnp.where(valid0[:, None], d2, big)
        back = jnp.argmin(d2b, axis=0).astype(jnp.int32)  # (N1,)
        ok &= back[idx1] == jnp.arange(desc0.shape[0], dtype=jnp.int32)
    return idx1, ok

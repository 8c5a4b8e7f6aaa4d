"""Closed-form small-matrix helpers.

TPU lowers batched tiny LU/eigh factorizations poorly (loops of scalar ops);
every 2x2/3x3 solve in the hot path uses these adjugate forms instead — pure
elementwise arithmetic that vmaps/fuses freely.
"""
from __future__ import annotations

import jax.numpy as jnp


def inv2(M: jnp.ndarray) -> jnp.ndarray:
    """Batched closed-form 2x2 inverse."""
    a, b = M[..., 0, 0], M[..., 0, 1]
    c, d = M[..., 1, 0], M[..., 1, 1]
    det = a * d - b * c
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    row0 = jnp.stack([d, -b], -1)
    row1 = jnp.stack([-c, a], -1)
    return jnp.stack([row0, row1], -2) / det[..., None, None]


def inv3(M: jnp.ndarray) -> jnp.ndarray:
    """Batched closed-form 3x3 inverse (adjugate / det)."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    adj = jnp.stack(
        [
            jnp.stack([A, -(b * i - c * h), b * f - c * e], -1),
            jnp.stack([B, a * i - c * g, -(a * f - c * d)], -1),
            jnp.stack([C, -(a * h - b * g), a * e - b * d], -1),
        ],
        -2,
    )
    return adj / det[..., None, None]


def solve3(M: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched 3x3 solve via the closed-form inverse."""
    return jnp.einsum("...ij,...j->...i", inv3(M), b)

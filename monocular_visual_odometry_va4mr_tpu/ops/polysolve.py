"""Closed-form cubic/quartic root finders in pure real jax.numpy.

Needed by the P3P minimal solver (ops/pnp.py): the Grunert system reduces to a
real quartic (SURVEY.md N8 "closed-form quartic roots").  TPU has no
nonsymmetric eigensolver (``jnp.linalg.eig`` is CPU-only), so companion-matrix
tricks are out; instead we use Cardano/trigonometric cubics and Ferrari
quartics with hand-rolled complex arithmetic (re/im pairs + polar sqrt) —
purely elementwise ops that vmap over hypothesis banks for free.

All functions are fully branchless (``jnp.where`` switches) and return every
root along with a real-root mask.
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


# --- minimal complex arithmetic on (re, im) pairs -------------------------

def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def _cdiv(ar, ai, br, bi):
    d = br * br + bi * bi + _EPS
    return (ar * br + ai * bi) / d, (ai * br - ar * bi) / d


def _csqrt(ar, ai):
    """Principal complex square root via polar form."""
    r = jnp.sqrt(ar * ar + ai * ai)
    theta = jnp.arctan2(ai, ar) * 0.5
    s = jnp.sqrt(r)
    return s * jnp.cos(theta), s * jnp.sin(theta)


def cubic_real_root(a2, a1, a0):
    """One real root of ``t^3 + a2 t^2 + a1 t + a0`` (always exists).

    Trigonometric method for the 3-real-root case, Cardano otherwise.
    Scalar in, scalar out; vmap for batches.
    """
    p = a1 - a2 * a2 / 3.0
    q = 2.0 * a2 ** 3 / 27.0 - a2 * a1 / 3.0 + a0
    shift = -a2 / 3.0

    disc = (q * q) / 4.0 + (p ** 3) / 27.0

    # Cardano branch (disc >= 0): one real root.
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    u = jnp.cbrt(-q / 2.0 + sq)
    v = jnp.cbrt(-q / 2.0 - sq)
    root_cardano = u + v

    # Trig branch (disc < 0): three real roots, take k=0.
    p_safe = jnp.minimum(p, -_EPS)
    m = 2.0 * jnp.sqrt(-p_safe / 3.0)
    arg = jnp.clip(3.0 * q / (p_safe * m), -1.0, 1.0)
    root_trig = m * jnp.cos(jnp.arccos(arg) / 3.0)

    return jnp.where(disc >= 0.0, root_cardano, root_trig) + shift


def quartic_roots(a3, a2, a1, a0, real_tol: float = 1e-4):
    """All four roots of ``x^4 + a3 x^3 + a2 x^2 + a1 x + a0``.

    Returns (roots (..., 4) f32 real parts, is_real (..., 4) bool).
    Ferrari's factorization into two quadratics via a resolvent-cubic root.
    """
    # Depress: x = y - a3/4.
    sh = a3 / 4.0
    p = a2 - 3.0 * a3 * a3 / 8.0
    q = a1 - a3 * a2 / 2.0 + a3 ** 3 / 8.0
    r = a0 - a3 * a1 / 4.0 + a3 * a3 * a2 / 16.0 - 3.0 * a3 ** 4 / 256.0

    # Resolvent cubic: 8 m^3 + 8 p m^2 + (2p^2 - 8r) m - q^2 = 0.
    m = cubic_real_root(p, (p * p - 4.0 * r) / 4.0, -q * q / 8.0)

    # alpha = sqrt(2m) (complex-safe).
    ar, ai = _csqrt(2.0 * m, jnp.zeros_like(m))
    # beta = q / (2 alpha); guard alpha ~ 0 (biquadratic case handled below).
    br, bi = _cdiv(q, jnp.zeros_like(q), 2.0 * ar, 2.0 * ai)

    half_p_m = p / 2.0 + m

    def quad_roots(Br, Bi, Cr, Ci):
        """Roots of y^2 + B y + C with complex B, C."""
        dr, di = _cmul(Br, Bi, Br, Bi)
        dr = dr - 4.0 * Cr
        di = di - 4.0 * Ci
        sr, si = _csqrt(dr, di)
        r1r, r1i = (-Br + sr) / 2.0, (-Bi + si) / 2.0
        r2r, r2i = (-Br - sr) / 2.0, (-Bi - si) / 2.0
        return (r1r, r1i), (r2r, r2i)

    # Factor: (y^2 - alpha y + (p/2 + m + beta)) (y^2 + alpha y + (p/2 + m - beta))
    (y1r, y1i), (y2r, y2i) = quad_roots(-ar, -ai, half_p_m + br, bi)
    (y3r, y3i), (y4r, y4i) = quad_roots(ar, ai, half_p_m - br, -bi)

    # Biquadratic fallback when alpha ~ 0 (q ~ 0): y^2 = (-p ± sqrt(p^2-4r))/2.
    alpha_small = (ar * ar + ai * ai) < 1e-10
    s2r, s2i = _csqrt(p * p - 4.0 * r, jnp.zeros_like(p))
    z1r, z1i = (-p + s2r) / 2.0, s2i / 2.0
    z2r, z2i = (-p - s2r) / 2.0, -s2i / 2.0
    b1r, b1i = _csqrt(z1r, z1i)
    b2r, b2i = _csqrt(z2r, z2i)
    y1r = jnp.where(alpha_small, b1r, y1r)
    y1i = jnp.where(alpha_small, b1i, y1i)
    y2r = jnp.where(alpha_small, -b1r, y2r)
    y2i = jnp.where(alpha_small, -b1i, y2i)
    y3r = jnp.where(alpha_small, b2r, y3r)
    y3i = jnp.where(alpha_small, b2i, y3i)
    y4r = jnp.where(alpha_small, -b2r, y4r)
    y4i = jnp.where(alpha_small, -b2i, y4i)

    roots_r = jnp.stack([y1r, y2r, y3r, y4r], axis=-1) - sh[..., None]
    roots_i = jnp.stack([y1i, y2i, y3i, y4i], axis=-1)
    scale = 1.0 + jnp.abs(roots_r)
    is_real = jnp.abs(roots_i) < real_tol * scale

    # Two Newton polish steps on the original quartic — recovers the f32
    # precision lost in the Ferrari cascade (measurably tightens P3P poses).
    def _newton(x):
        f = (((x + a3[..., None]) * x + a2[..., None]) * x + a1[..., None]) * x \
            + a0[..., None]
        df = ((4.0 * x + 3.0 * a3[..., None]) * x + 2.0 * a2[..., None]) * x \
            + a1[..., None]
        return x - f / jnp.where(jnp.abs(df) < _EPS, _EPS, df)

    polished = _newton(_newton(roots_r))
    roots_r = jnp.where(is_real & jnp.isfinite(polished), polished, roots_r)
    return roots_r, is_real

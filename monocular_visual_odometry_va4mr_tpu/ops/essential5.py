"""Nistér 5-point minimal essential-matrix solver, TPU-native and branchless.

``cv2.findEssentialMat`` (reference VisualOdometryPipeLine.py:308) uses the
5-point minimal solver inside RANSAC; round 1 shipped the normalized 8-point
fallback (ops/essential.py), which is degenerate for planar scenes — exactly
the parking-lot/building-wall bootstrap geometry the reference targets
(VERDICT.md round 1, item 3).

Method (Nistér, "An efficient solution to the five-point relative pose
problem", PAMI 2004 — algorithm re-derived here, no code ported):

 1. The 4-dim nullspace of the 5x9 epipolar constraint matrix gives
    E = x*E1 + y*E2 + z*E3 + E4.
 2. det(E) = 0 plus the nine trace constraints 2*E*E^T*E - tr(E*E^T)*E = 0
    give ten cubic polynomials in (x, y, z); their 10x20 coefficient matrix
    is built symbolically at *trace time* (Python dict algebra over exponent
    tuples) so the runtime work is pure elementwise arithmetic.
 3. Branchless Gauss-Jordan elimination (partial pivoting, static 10 steps)
    reduces the system; three row combinations eliminate the x/y quadratic
    monomials, leaving a 3x3 matrix B(z) of polynomials (deg 3,3,4) whose
    determinant is the classic degree-10 polynomial in z.
 4. TPU has no nonsymmetric eigensolver (SURVEY.md "hard parts" #2), so the
    real roots come from a tan-spaced sign-change sweep + fixed-iteration
    bisection + Newton polish — fully vmappable, no data-dependent control
    flow.
 5. Each real root back-substitutes to (x, y) via the best-conditioned cross
    product of rows of B(z), yielding up to 10 essential matrices per sample.

Everything runs in f32; RANSAC scoring + the final 8-point least-squares
refit on the winning inlier set (ops/essential.py) absorb the f32 hypothesis
noise.
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

# Degree-3 monomial order in (x, y, z); the first 10 columns are eliminated
# by Gauss-Jordan, the last 10 (pure-z times {x, y, 1}) form B(z).
_MONOMIALS = [
    (3, 0, 0), (0, 3, 0), (2, 1, 0), (1, 2, 0), (2, 0, 1),
    (2, 0, 0), (0, 2, 1), (0, 2, 0), (1, 1, 1), (1, 1, 0),
    (1, 0, 2), (1, 0, 1), (1, 0, 0), (0, 1, 2), (0, 1, 1),
    (0, 1, 0), (0, 0, 3), (0, 0, 2), (0, 0, 1), (0, 0, 0),
]
_MON_INDEX = {m: i for i, m in enumerate(_MONOMIALS)}

Poly = Dict[Tuple[int, int, int], jnp.ndarray]


def _pmul(a: Poly, b: Poly) -> Poly:
    out: Poly = {}
    for ea, ca in a.items():
        for eb, cb in b.items():
            e = (ea[0] + eb[0], ea[1] + eb[1], ea[2] + eb[2])
            term = ca * cb
            out[e] = out[e] + term if e in out else term
    return out


def _padd(a: Poly, b: Poly, sb: float = 1.0) -> Poly:
    out = dict(a)
    for e, c in b.items():
        out[e] = out[e] + sb * c if e in out else sb * c
    return out


def _coeff_row(p: Poly) -> jnp.ndarray:
    """Poly in (x,y,z), degree <= 3 -> 20-vector in _MONOMIALS order."""
    zero = jnp.zeros(())
    return jnp.stack([p.get(m, zero) for m in _MONOMIALS])


def _constraint_matrix(E1, E2, E3, E4) -> jnp.ndarray:
    """The 10x20 cubic-constraint coefficient matrix for
    E = x*E1 + y*E2 + z*E3 + E4."""
    # E entries as degree-1 polys.
    Ep = [[{(1, 0, 0): E1[i, j], (0, 1, 0): E2[i, j],
            (0, 0, 1): E3[i, j], (0, 0, 0): E4[i, j]}
           for j in range(3)] for i in range(3)]

    # det(E) = 0 via cofactor expansion along row 0.
    def minor(r0, r1, c0, c1):
        return _padd(_pmul(Ep[r0][c0], Ep[r1][c1]),
                     _pmul(Ep[r0][c1], Ep[r1][c0]), -1.0)

    detE = _padd(
        _padd(_pmul(Ep[0][0], minor(1, 2, 1, 2)),
              _pmul(Ep[0][1], minor(1, 2, 0, 2)), -1.0),
        _pmul(Ep[0][2], minor(1, 2, 0, 1)))

    # Trace constraint: 2*E*E^T*E - tr(E*E^T)*E = 0 (nine deg-3 polys).
    EEt = [[None] * 3 for _ in range(3)]
    for i in range(3):
        for j in range(3):
            acc: Poly = {}
            for k in range(3):
                acc = _padd(acc, _pmul(Ep[i][k], Ep[j][k]))
            EEt[i][j] = acc
    tr: Poly = {}
    for i in range(3):
        tr = _padd(tr, EEt[i][i])

    rows = [_coeff_row(detE)]
    for i in range(3):
        for j in range(3):
            acc: Poly = {}
            for k in range(3):
                acc = _padd(acc, _pmul(EEt[i][k], Ep[k][j]))
            acc = {e: 2.0 * c for e, c in acc.items()}
            acc = _padd(acc, _pmul(tr, Ep[i][j]), -1.0)
            rows.append(_coeff_row(acc))
    return jnp.stack(rows)  # (10, 20)


def _gauss_jordan10(A: jnp.ndarray) -> jnp.ndarray:
    """Reduce the first 10 columns of (10, 20) A to identity (partial
    pivoting, branchless)."""
    for i in range(10):
        col = jnp.abs(A[:, i])
        col = jnp.where(jnp.arange(10) < i, -1.0, col)
        p = jnp.argmax(col)
        rowi, rowp = A[i], A[p]
        A = A.at[i].set(rowp).at[p].set(rowi)
        piv = A[i, i]
        inv = jnp.where(jnp.abs(piv) > 1e-20, 1.0 / piv, 0.0)
        A = A.at[i].set(A[i] * inv)
        fac = A[:, i].at[i].set(0.0)
        A = A - fac[:, None] * A[i][None, :]
    return A


def _poly_mul1(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """1-D poly product, coefficients lowest-power-first, static lengths."""
    na, nb = a.shape[0], b.shape[0]
    out = [jnp.zeros(()) for _ in range(na + nb - 1)]
    for i in range(na):
        for j in range(nb):
            out[i + j] = out[i + j] + a[i] * b[j]
    return jnp.stack(out)


def _psub(a, b):
    n = max(a.shape[0], b.shape[0])
    a = jnp.pad(a, (0, n - a.shape[0]))
    b = jnp.pad(b, (0, n - b.shape[0]))
    return a - b


def _degree10_poly(A: jnp.ndarray):
    """From the reduced matrix, build B(z) and det(B) (degree 10).

    Returns (p (11,) coeffs lowest-first, B builders for back-substitution:
    Bx (3,4), By (3,4), B1 (3,5))."""
    t = A[4:10, 10:20]  # rows with leading monomials x2z,x2,y2z,y2,xyz,xy

    def krow(ta, tb):
        # <a> - z*<b>: x-poly, y-poly (deg 3, low-first), 1-poly (deg 4).
        bx = jnp.stack([ta[2], ta[1] - tb[2], ta[0] - tb[1], -tb[0]])
        by = jnp.stack([ta[5], ta[4] - tb[5], ta[3] - tb[4], -tb[3]])
        b1 = jnp.stack([ta[9], ta[8] - tb[9], ta[7] - tb[8],
                        ta[6] - tb[7], -tb[6]])
        return bx, by, b1

    k = krow(t[0], t[1])
    l = krow(t[2], t[3])
    m = krow(t[4], t[5])
    Bx = jnp.stack([k[0], l[0], m[0]])  # (3, 4)
    By = jnp.stack([k[1], l[1], m[1]])  # (3, 4)
    B1 = jnp.stack([k[2], l[2], m[2]])  # (3, 5)

    # det(B) with columns (Bx, By, B1) and rows (k, l, m).
    def m2(p, q, r, s):  # p*s - q*r
        return _psub(_poly_mul1(p, s), _poly_mul1(q, r))

    det = _psub(
        _poly_mul1(Bx[0], m2(By[1], B1[1], By[2], B1[2])),
        _poly_mul1(By[0], m2(Bx[1], B1[1], Bx[2], B1[2])),
    )
    det = det + jnp.pad(
        _poly_mul1(B1[0], m2(Bx[1], By[1], Bx[2], By[2])),
        (0, det.shape[0] - 11))[:det.shape[0]]
    return det[:11], (Bx, By, B1)


def _poly_eval(p: jnp.ndarray, z):
    """Horner, coefficients lowest-first; p (..., D), z (...,) or scalar."""
    acc = jnp.zeros_like(z) + p[..., -1]
    for i in range(p.shape[-1] - 2, -1, -1):
        acc = acc * z + p[..., i]
    return acc


def _real_roots10(p: jnp.ndarray, n_grid: int = 257, n_bisect: int = 30):
    """Up to 10 real roots of a degree-10 poly by tan-grid sign sweep +
    bisection + Newton. Returns (roots (10,), valid (10,))."""
    scale = jnp.max(jnp.abs(p)) + 1e-30
    p = p / scale
    dp = p[1:] * jnp.arange(1, 11, dtype=p.dtype)

    theta = jnp.linspace(-jnp.pi / 2 + 6e-3, jnp.pi / 2 - 6e-3, n_grid)
    zs = jnp.tan(theta) * 3.0  # dense near 0, reaches |z| ~ 500
    vals = _poly_eval(p, zs)
    sign = jnp.where(vals >= 0, 1.0, -1.0)
    change = (sign[:-1] * sign[1:]) < 0  # (n_grid-1,)

    order = jnp.argsort(~change, stable=True)
    idx = order[:10]
    valid = change[idx]
    lo = zs[idx]
    hi = zs[idx + 1]
    flo = _poly_eval(p, lo)

    for _ in range(n_bisect):
        mid = 0.5 * (lo + hi)
        fmid = _poly_eval(p, mid)
        go_left = (flo * fmid) <= 0
        hi = jnp.where(go_left, mid, hi)
        lo = jnp.where(go_left, lo, mid)
        flo = jnp.where(go_left, flo, fmid)

    root = 0.5 * (lo + hi)
    for _ in range(3):  # Newton polish
        f = _poly_eval(p, root)
        d = _poly_eval(dp, root)
        step = f / jnp.where(jnp.abs(d) > 1e-20, d, 1e-20)
        newr = root - step
        ok_step = jnp.isfinite(newr) & (jnp.abs(newr - root) < 1.0)
        root = jnp.where(ok_step, newr, root)
    return root, valid


def five_point_essentials(x0: jnp.ndarray, x1: jnp.ndarray):
    """Essential matrices from 5 normalized-coordinate correspondences.

    x0, x1: (5, 2) normalized camera coords; convention x1^T E x0 = 0
    (matches ops/essential.py / cv2.findEssentialMat points1=x0).
    Returns (Es (10, 3, 3), valid (10,)).
    """
    u0, v0 = x0[:, 0], x0[:, 1]
    u1, v1 = x1[:, 0], x1[:, 1]
    ones = jnp.ones_like(u0)
    Q = jnp.stack(
        [u1 * u0, u1 * v0, u1, v1 * u0, v1 * v0, v1, u0, v0, ones], axis=-1
    )  # (5, 9)
    # Nullspace basis by SVD of Q, NOT eigh(Q^T Q): squaring the matrix
    # squares its condition number, which in f32 visibly corrupts the
    # downstream degree-10 coefficients (measured round 3: worst-case E
    # error 0.27 with eigh vs 1.7e-3 with SVD on identical samples).
    _, _, Vt = jnp.linalg.svd(Q, full_matrices=True)
    E1 = Vt[8].reshape(3, 3)
    E2 = Vt[7].reshape(3, 3)
    E3 = Vt[6].reshape(3, 3)
    E4 = Vt[5].reshape(3, 3)

    A = _constraint_matrix(E1, E2, E3, E4)
    A = _gauss_jordan10(A)
    p10, (Bx, By, B1) = _degree10_poly(A)
    roots, rvalid = _real_roots10(p10)

    def assemble(z, ok):
        bx = _poly_eval(Bx, z)  # (3,)
        by = _poly_eval(By, z)
        b1 = _poly_eval(B1, z)
        B = jnp.stack([bx, by, b1], axis=1)  # (3, 3): rows k/l/m
        n12 = jnp.cross(B[0], B[1])
        n13 = jnp.cross(B[0], B[2])
        n23 = jnp.cross(B[1], B[2])
        ns = jnp.stack([n12, n13, n23])
        best = jnp.argmax(jnp.abs(ns[:, 2]))
        n = ns[best]
        w = jnp.where(jnp.abs(n[2]) > 1e-20, 1.0 / n[2], 0.0)
        x = n[0] * w
        y = n[1] * w
        E = x * E1 + y * E2 + z * E3 + E4
        nrm = jnp.sqrt(jnp.sum(E * E))
        E = E / jnp.where(nrm > 1e-20, nrm, 1.0)
        ok = ok & (jnp.abs(n[2]) > 1e-12) & jnp.isfinite(x) & jnp.isfinite(y)
        return E, ok

    Es, valid = jax.vmap(assemble)(roots, rvalid)
    return Es, valid

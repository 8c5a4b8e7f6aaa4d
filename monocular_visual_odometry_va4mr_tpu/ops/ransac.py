"""Fixed-budget RANSAC utilities.

OpenCV's RANSAC loops adaptively until a confidence bound is met (reference
uses prob/conf 0.99 at VisualOdometryPipeLine.py:308 and :343).  Data-dependent
trip counts don't compile on TPU, so the framework uses *static hypothesis
banks* (SURVEY.md "hard parts" #1): sample all hypotheses up front, evaluate
them in parallel (vmap -> VPU/MXU), pick the argmax inlier count.  Budgets are
sized so that the static bank dominates OpenCV's adaptive expectation for the
datasets' inlier ratios, and runs are deterministic under a threaded PRNG key
(reference RANSAC is unseeded — Quirk Q8).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_minimal_sets(
    key: jax.Array,
    valid: jnp.ndarray,  # (N,) bool
    num_hypotheses: int,
    sample_size: int,
):
    """Draw ``num_hypotheses`` index tuples from the valid rows of a table.

    Returns:
      idx: (num_hypotheses, sample_size) int32 indices into the table.
      ok:  (num_hypotheses,) bool — all draws valid and pairwise distinct.
    """
    N = valid.shape[0]
    order = jnp.argsort(~valid, stable=True)  # valid indices first
    n_valid = jnp.sum(valid).astype(jnp.int32)
    r = jax.random.randint(
        key, (num_hypotheses, sample_size), 0, jnp.maximum(n_valid, 1)
    )
    idx = order[r]
    # Pairwise-distinct check within each tuple.
    eq = r[..., :, None] == r[..., None, :]
    eq = eq & ~jnp.eye(sample_size, dtype=bool)
    distinct = ~jnp.any(eq, axis=(-1, -2))
    ok = distinct & (n_valid >= sample_size)
    return idx.astype(jnp.int32), ok


def best_hypothesis(scores: jnp.ndarray, ok: jnp.ndarray):
    """Argmax inlier score over the bank; returns (index, score, any_ok)."""
    masked = jnp.where(ok, scores, -1)
    i = jnp.argmax(masked)
    return i, masked[i], masked[i] >= 0

"""Fixed-capacity slotted-table utilities.

The reference grows and shrinks its keypoint/landmark tables dynamically with
``np.append`` (VisualOdometryPipeLine.py:201-202,:242-245,:266-268) and boolean
compaction (``filter_potential``/``filter_landmarks``, :80-104).  Dynamic
shapes would force recompilation every frame under XLA, so here every table has
a static capacity plus a validity mask, and "append" becomes a deterministic
scatter of new rows into free slots (SURVEY.md §7 "slot allocation under
masking").
"""
from __future__ import annotations

import jax.numpy as jnp


def alloc_slots(valid: jnp.ndarray, new_mask: jnp.ndarray):
    """Assign new items to free slots of a fixed-capacity table.

    Args:
      valid: (cap,) bool — currently occupied slots.
      new_mask: (n,) bool — which of the n offered items are real.

    Returns:
      slots: (n,) int32 — target slot for each offered item; items that were
        not accepted get slot ``cap`` (out of bounds — scatter with
        ``mode='drop'``).
      accepted: (n,) bool — new_mask AND a free slot was available.
    """
    cap = valid.shape[0]
    # Stable argsort of the validity mask puts free slots (False=0) first,
    # in ascending index order — a deterministic free list.
    free_order = jnp.argsort(valid.astype(jnp.int32), stable=True)
    n_free = jnp.sum(~valid)
    rank = jnp.cumsum(new_mask.astype(jnp.int32)) - 1  # rank among accepted items
    accepted = new_mask & (rank < n_free)
    slots = jnp.where(accepted, free_order[jnp.clip(rank, 0, cap - 1)], cap)
    return slots.astype(jnp.int32), accepted


def scatter_rows(table: jnp.ndarray, slots: jnp.ndarray, values: jnp.ndarray) -> jnp.ndarray:
    """Write ``values[i]`` into ``table[slots[i]]``; slot == cap rows are dropped."""
    return table.at[slots].set(values, mode="drop")


def masked_top_k(scores: jnp.ndarray, mask: jnp.ndarray, k: int):
    """Top-k of ``scores`` restricted to ``mask``; returns (values, indices, valid)."""
    from jax import lax

    neg = jnp.finfo(scores.dtype).min
    masked = jnp.where(mask, scores, neg)
    vals, idx = lax.top_k(masked, k)
    return vals, idx, vals > neg

"""Whole-sequence processing with ``lax.scan`` — the per-frame step compiled
ONCE and iterated on-device, with zero per-frame host dispatch.

This is the execution model the FrameState design buys (SURVEY.md §7: "step:
(FrameState, image) -> (FrameState, outputs) — jit-compiled, scan-able"):
the host uploads a block of frames, the device runs the VO loop over the
whole block, and only the compact per-frame outputs come back.  Used by
bench.py for the headline throughput and by the sequence-DP path
(frames axis on-device, sequences sharded over the mesh).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.state import FrameState
from .vo import VisualOdometry


class ScanOutputs(NamedTuple):
    T_CW: jnp.ndarray  # (F, 4, 4)
    n_inliers: jnp.ndarray  # (F,) int32
    n_tracked: jnp.ndarray  # (F,) int32
    status: jnp.ndarray  # (F,) int32


def make_scan_step(vo: VisualOdometry):
    """Returns jitted (state, images (F,H,W), keys (F,2)) -> (state, outputs)."""

    def scan_body(state: FrameState, inp):
        img, key = inp
        new_state = vo._step_impl(state, img, key)
        out = (new_state.T_CW, new_state.n_inliers, new_state.n_tracked,
               new_state.status)
        return new_state, out

    @jax.jit
    def run(state: FrameState, images: jnp.ndarray, keys: jnp.ndarray):
        final, outs = jax.lax.scan(scan_body, state, (images, keys))
        return final, ScanOutputs(*outs)

    return run


def run_block(vo: VisualOdometry, state: FrameState, images, seed_keys):
    """Convenience wrapper: process a stacked frame block on device."""
    run = make_scan_step(vo)
    return run(state, jnp.asarray(images, jnp.float32), seed_keys)


def run_streaming(vo: VisualOdometry, state: FrameState, frames, key,
                  *, block: int = 64):
    """Long-sequence streaming: fixed-size scan blocks with the FrameState
    carried across block boundaries, host upload of block k+1 overlapped
    with device compute of block k (JAX async dispatch — the ``run`` call
    returns before the device finishes, so the host stacks and uploads the
    next block while the chip works).

    This is the production path for reference-scale sequences (KITTI-05 =
    2761 frames, reference main.py:17): ONE compiled executable (every
    block has the same static shape; the tail is padded and masked out of
    the returned outputs), O(block) host memory, and only the compact
    per-frame outputs come back per block.

    ``frames``: iterator/iterable of (frame_idx, image) pairs (e.g.
    ``SequenceSpec.frames()`` streaming through the native PNG decoder).
    Returns (final_state, ScanOutputs over all frames, frame_ids list).
    """
    import numpy as np

    run = make_scan_step(vo)
    it = iter(frames)

    def next_block():
        ids, imgs = [], []
        for idx, img in it:
            ids.append(idx)
            imgs.append(np.asarray(img, np.float32))
            if len(imgs) == block:
                break
        if not imgs:
            return None, None, 0
        n = len(imgs)
        while len(imgs) < block:  # pad the tail; outputs sliced off below
            imgs.append(imgs[-1])
        stacked = jax.device_put(jnp.asarray(np.stack(imgs)))
        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
            jnp.asarray(ids + [ids[-1]] * (block - n), jnp.int32))
        return (ids, (stacked, keys), n)

    outs_all = []
    frame_ids = []
    ids, dev, n = next_block()
    while dev is not None:
        new_state, outs = run(state, *dev)  # async: returns immediately
        # Overlap: stack/upload the NEXT block while the device runs.
        next_ids, next_dev, next_n = next_block()
        # (On the padded tail block the carried state advances through the
        # repeated last frame — harmless: the stream ends here and only
        # the real frames' outputs are kept.)
        state = new_state
        outs_all.append(jax.tree.map(lambda x: x[:n], outs))
        frame_ids.extend(ids[:n])
        ids, dev, n = next_ids, next_dev, next_n

    merged = ScanOutputs(*(jnp.concatenate([getattr(o, f) for o in outs_all])
                           for f in ScanOutputs._fields))
    return state, merged, frame_ids

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

"""Checkpoint / resume for the VO state.

The reference has no checkpointing — a crash at frame 2000 of 2761 loses the
whole run (reference main.py:166-170; SURVEY.md §5).  Because ``FrameState``
is a fixed-shape pytree, checkpointing is a straight orbax save of the state
plus the frame cursor; resume restores the pytree and continues the loop.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..core.state import FrameState

_STATE_DIR = "state"
_META_FILE = "meta.npz"


def save(directory: str, state: FrameState, frame_index: int) -> None:
    """Write a resumable checkpoint (overwrites the previous one)."""
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    ckptr = ocp.PyTreeCheckpointer()
    path = os.path.join(directory, _STATE_DIR)
    ckptr.save(path, jax.tree.map(np.asarray, state), force=True)
    np.savez(os.path.join(directory, _META_FILE), frame_index=frame_index)


def restore(directory: str, template: FrameState) -> Tuple[FrameState, int]:
    """Restore (state, next_frame_index) from a checkpoint directory.

    ``template`` supplies the pytree structure/shapes (build it with
    ``VisualOdometry.bootstrap`` on dummy frames or ``init_state``)."""
    directory = os.path.abspath(directory)
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(os.path.join(directory, _STATE_DIR),
                             item=jax.tree.map(np.asarray, template))
    state = jax.tree.map(lambda t, r: jax.numpy.asarray(r), template, restored)
    meta = np.load(os.path.join(directory, _META_FILE))
    return state, int(meta["frame_index"])


def latest_frame(directory: str) -> Optional[int]:
    meta_path = os.path.join(directory, _META_FILE)
    if not os.path.exists(meta_path):
        return None
    return int(np.load(meta_path)["frame_index"])

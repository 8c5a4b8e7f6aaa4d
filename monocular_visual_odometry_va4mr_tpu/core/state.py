"""The fixed-shape per-frame VO state (the TPU form of the reference's
``VisualOdometryPipeLine`` attribute soup, VisualOdometryPipeLine.py:33-59).

The reference keeps:
  * ``transforms``          — ever-growing list of poses
  * ``matched_keypoints`` / ``matched_landmarks``  — landmark-backed tracks
  * ``potential_keys`` / ``potential_first_keys`` / ``potential_transforms``
                            — candidate tracks awaiting triangulation
  * ``potential_frame``     — previous image for KLT

Here all of that becomes one pytree of fixed-capacity tables + masks so that
``step(state, image) -> state`` is a single compiled function usable under
``jax.jit`` / ``lax.scan`` / ``pjit``.  Two deliberate design departures:

  1. Candidates store their *first-observation extrinsics* (4x4) inline rather
     than an index into a growing pose list (reference
     VisualOdometryPipeLine.py:180) — removes the unbounded ``transforms``
     array from the hot state at the cost of 16 floats/candidate.
  2. Failure is a status code carried in the state (LOST) instead of a raised
     ``ValueError`` (reference VisualOdometryPipeLine.py:352,:358), enabling
     re-bootstrap and making the step total.
"""
from __future__ import annotations

from typing import Tuple

import flax.struct
import jax.numpy as jnp

from .config import PipelineConfig

# Status codes (int32 in the state).
STATUS_TRACKING = 0
STATUS_LOST = 1


@flax.struct.dataclass
class FrameState:
    # --- pose ---
    frame_idx: jnp.ndarray  # () int32
    T_CW: jnp.ndarray  # (4,4) f32 current extrinsics (world -> camera)

    # --- landmark-backed tracks ("matched_*") ---
    lm_xyz: jnp.ndarray  # (K,3) world-frame landmarks
    lm_uv: jnp.ndarray  # (K,2) current pixel coords
    lm_valid: jnp.ndarray  # (K,) bool
    lm_inlier: jnp.ndarray  # (K,) bool — last PnP-RANSAC inlier mask (viz/metrics)
    lm_gen: jnp.ndarray  # (K,) int32 — slot generation; bumps on re-allocation
    # so cross-frame consumers (windowed BA) can detect slot reuse

    # --- landmark anchor observation (sliding re-triangulation) ---
    # Frame-to-frame KLT chaining drifts ~0.3-0.5 px/frame under forward
    # motion (translation-only LK on zooming texture); with a FIXED 3D point
    # the accumulated drift walks every landmark off the PnP inlier set
    # within ~15 frames and the map starves (measured round 3, tools/
    # diag_drift.py).  Each landmark therefore carries an anchor observation
    # (pixel + extrinsics, refreshed every reanchor_age frames) and is
    # re-triangulated against it each frame, so PnP sees at most one
    # anchor-window of drift.  The reference has no equivalent (its fixed
    # landmarks simply get culled, VisualOdometryPipeLine.py:350).
    lm_first_uv: jnp.ndarray  # (K,2) anchor pixel coords
    lm_T_CW_first: jnp.ndarray  # (K,4,4) anchor extrinsics
    lm_anchor_age: jnp.ndarray  # (K,) int32 frames since anchor refresh

    # --- candidate tracks ("potential_*") ---
    cand_uv: jnp.ndarray  # (M,2) current pixel coords
    cand_first_uv: jnp.ndarray  # (M,2) pixel coords at first observation
    cand_T_CW_first: jnp.ndarray  # (M,4,4) extrinsics at first observation
    cand_first_frame: jnp.ndarray  # (M,) int32 frame index of first observation
    cand_valid: jnp.ndarray  # (M,) bool

    # --- in-step BA observation ring (InStepBAConfig; length 1 when off) ---
    ba_T: jnp.ndarray  # (Wb,4,4) ring of extrinsics
    ba_uv: jnp.ndarray  # (Wb,K,2) ring of landmark observations
    ba_mask: jnp.ndarray  # (Wb,K) bool
    ba_gen: jnp.ndarray  # (Wb,K) int32 slot generation at observation time

    # --- previous-frame pyramid for KLT (reference ``potential_frame``) ---
    prev_pyramid: Tuple[jnp.ndarray, ...]  # tuple of (H/2^l, W/2^l) f32

    # --- health/metrics ---
    status: jnp.ndarray  # () int32, STATUS_*
    n_inliers: jnp.ndarray  # () int32 — PnP inliers this frame (ref num_pts)
    n_tracked: jnp.ndarray  # () int32 — landmark tracks surviving KLT


def init_state(config: PipelineConfig, pyramid: Tuple[jnp.ndarray, ...]) -> FrameState:
    """Blank state at the identity pose (reference seeds transforms with
    (I, 0), VisualOdometryPipeLine.py:43-45)."""
    K = config.capacity.max_landmarks
    M = config.capacity.max_candidates
    return FrameState(
        frame_idx=jnp.zeros((), jnp.int32),
        T_CW=jnp.eye(4, dtype=jnp.float32),
        lm_xyz=jnp.zeros((K, 3), jnp.float32),
        lm_uv=jnp.zeros((K, 2), jnp.float32),
        lm_valid=jnp.zeros((K,), bool),
        lm_inlier=jnp.zeros((K,), bool),
        lm_gen=jnp.zeros((K,), jnp.int32),
        lm_first_uv=jnp.zeros((K, 2), jnp.float32),
        lm_T_CW_first=jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (K, 1, 1)),
        lm_anchor_age=jnp.zeros((K,), jnp.int32),
        cand_uv=jnp.zeros((M, 2), jnp.float32),
        cand_first_uv=jnp.zeros((M, 2), jnp.float32),
        cand_T_CW_first=jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (M, 1, 1)),
        cand_first_frame=jnp.zeros((M,), jnp.int32),
        cand_valid=jnp.zeros((M,), bool),
        ba_T=jnp.tile(jnp.eye(4, dtype=jnp.float32)[None],
                      (max(1, config.ba.window if config.ba.every else 1), 1, 1)),
        ba_uv=jnp.zeros((max(1, config.ba.window if config.ba.every else 1),
                         K, 2), jnp.float32),
        ba_mask=jnp.zeros((max(1, config.ba.window if config.ba.every else 1),
                           K), bool),
        ba_gen=jnp.zeros((max(1, config.ba.window if config.ba.every else 1),
                          K), jnp.int32),
        prev_pyramid=pyramid,
        status=jnp.zeros((), jnp.int32),
        n_inliers=jnp.zeros((), jnp.int32),
        n_tracked=jnp.zeros((), jnp.int32),
    )

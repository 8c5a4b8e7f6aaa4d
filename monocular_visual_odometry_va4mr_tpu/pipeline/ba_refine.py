"""Sliding-window BA refinement woven into the VO loop.

BASELINE.json configs[3]: "KITTI 05 + sliding-window BA (new back-end):
windowed Schur-complement refinement".  The fixed-capacity landmark table
makes this nearly free to wire up: a landmark keeps its slot for its whole
life, so a window of ``lm_uv`` snapshots IS the (W, L, 2) observation grid —
no correspondence bookkeeping.

Host flow (pipeline/runner.py):
  * every frame, append (T_CW, lm_uv, lm_valid & lm_inlier) to a ring;
  * every ``ba_every`` frames, build a BAWindow from the ring + current
    lm_xyz, run backend.ba.run_ba (or the sharded variant on a mesh), and
    write the refined current pose + landmark positions back into the state.

Only landmarks observed in >= min_obs window frames participate; everything
else passes through unchanged.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..backend import ba
from ..core.camera import Camera
from ..core.state import FrameState


@dataclasses.dataclass
class BARing:
    """Host-side ring of per-frame observation snapshots."""

    window: int
    poses: List[np.ndarray] = dataclasses.field(default_factory=list)
    obs_uv: List[np.ndarray] = dataclasses.field(default_factory=list)
    obs_mask: List[np.ndarray] = dataclasses.field(default_factory=list)
    obs_gen: List[np.ndarray] = dataclasses.field(default_factory=list)

    def push(self, state: FrameState) -> None:
        self.poses.append(np.asarray(state.T_CW))
        self.obs_uv.append(np.asarray(state.lm_uv))
        self.obs_mask.append(
            np.asarray(state.lm_valid & state.lm_inlier)
        )
        self.obs_gen.append(np.asarray(state.lm_gen))
        if len(self.poses) > self.window:
            self.poses.pop(0)
            self.obs_uv.pop(0)
            self.obs_mask.pop(0)
            self.obs_gen.pop(0)

    def __len__(self):
        return len(self.poses)


def refine(
    state: FrameState,
    ring: BARing,
    cam: Camera,
    *,
    iters: int = 4,
    huber_px: float = 3.0,
    min_obs: int = 3,
    mesh=None,
) -> FrameState:
    """Run windowed BA over the ring and fold the result into the state.

    Returns the state with refined ``T_CW`` and ``lm_xyz`` (only landmarks
    that participated are touched).  With ``mesh`` set, uses the
    landmark-sharded distributed reduction (parallel/ba_sharded.py).
    """
    W = len(ring)
    if W < 3:
        return state

    obs_uv = jnp.asarray(np.stack(ring.obs_uv))  # (W, L, 2)
    obs_mask = np.stack(ring.obs_mask)  # (W, L)
    # Slot-reuse guard: only observations from the slot's CURRENT tenant
    # (generation) are valid — a re-allocated slot's earlier rows belong to a
    # different physical landmark.
    gen_now = np.asarray(state.lm_gen)
    obs_mask &= np.stack(ring.obs_gen) == gen_now[None, :]
    n_obs = obs_mask.sum(axis=0)
    participate = (n_obs >= min_obs) & np.asarray(state.lm_valid)
    obs_mask = jnp.asarray(obs_mask & participate[None, :])

    window = ba.BAWindow(
        T_CW=jnp.asarray(np.stack(ring.poses), jnp.float32),
        lm_xyz=state.lm_xyz,
        obs_uv=obs_uv,
        obs_mask=obs_mask,
    )
    if mesh is not None:
        from ..parallel import ba_sharded

        window = ba_sharded.shard_window(window, mesh)
        out, _ = ba_sharded.run_ba_sharded(
            window, cam, mesh=mesh, iters=iters, huber_px=huber_px
        )
    else:
        out, _ = ba.run_ba(window, cam, iters=iters, huber_px=huber_px)

    part = jnp.asarray(participate)
    lm_xyz = jnp.where(part[:, None], out.lm_xyz, state.lm_xyz)
    new_state = state.replace(T_CW=out.T_CW[-1], lm_xyz=lm_xyz)

    # Update the ring's poses so subsequent windows start refined.
    refined = np.asarray(out.T_CW)
    for k in range(W):
        ring.poses[k] = refined[k]
    return new_state

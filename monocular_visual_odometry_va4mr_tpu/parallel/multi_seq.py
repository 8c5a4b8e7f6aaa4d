"""Run many sequences in data-parallel lockstep over a device mesh.

BASELINE.json configs[4]: "KITTI odometry 00-10 batched across chips with
distributed pose-graph/BA on multi-host slice".  Each mesh slot owns one
sequence; the per-frame step is vmapped over the batch and the leading axis
is sharded, so every chip steps its own sequence with zero collectives
(the distributed BA/pose-graph backends add the collectives where they pay).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.state import FrameState
from ..pipeline.vo import VisualOdometry
from . import seq_dp


@dataclasses.dataclass
class MultiSeqResult:
    positions: np.ndarray  # (S, F, 3) camera centers per sequence per frame
    n_inliers: np.ndarray  # (S, F)
    status: np.ndarray  # (S, F)


def run_sequences_dp(
    vo: VisualOdometry,
    sequences: Sequence[List[np.ndarray]],
    *,
    n_devices: int | None = None,
    bootstrap_stride: int = 2,
    seed: int = 0,
    axis: str = "data",
) -> MultiSeqResult:
    """Process S same-shape sequences in lockstep, one per mesh slot.

    ``sequences``: list of frame lists (all frames (H, W)); sequences shorter
    than the longest are padded by repeating their last frame (their status
    simply keeps tracking in place).
    """
    S = len(sequences)
    n_devices = n_devices or S
    assert S <= n_devices, "more sequences than mesh slots"
    mesh = seq_dp.make_mesh(n_devices, axis)
    key = jax.random.PRNGKey(seed)

    F = max(len(s) for s in sequences)
    padded = [list(s) + [s[-1]] * (F - len(s)) for s in sequences]
    # Pad the batch to the mesh size by repeating the last sequence.
    while len(padded) < n_devices:
        padded.append(padded[-1])

    # Per-sequence bootstrap (host loop; compiled pieces are shared).
    states = []
    for si, seq in enumerate(padded):
        st = vo.bootstrap(
            seq[0], seq[bootstrap_stride], jax.random.fold_in(key, 7777 + si),
            intermediate=seq[1:bootstrap_stride],
        )
        states.append(st)
    batch_state: FrameState = jax.tree.map(
        lambda *xs: jnp.stack(xs), *states
    )

    jstep, shard_tree = seq_dp.batched_step(vo, mesh, axis)
    with mesh:
        batch_state = shard_tree(batch_state)
        poses, inliers, statuses = [], [], []
        for f in range(bootstrap_stride + 1, F):
            imgs = jnp.stack(
                [jnp.asarray(seq[f], jnp.float32) for seq in padded]
            )
            imgs = shard_tree(imgs)
            keys = jax.vmap(
                lambda s: jax.random.fold_in(jax.random.fold_in(key, f), s)
            )(jnp.arange(n_devices))
            batch_state = jstep(batch_state, imgs, keys)
            poses.append(np.asarray(batch_state.T_CW))
            inliers.append(np.asarray(batch_state.n_inliers))
            statuses.append(np.asarray(batch_state.status))

    T = np.stack(poses, axis=1)  # (S', F', 4, 4)
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    centers = -np.einsum("sfij,sfi->sfj", R, t)
    return MultiSeqResult(
        positions=centers[:S],
        n_inliers=np.stack(inliers, 1)[:S],
        status=np.stack(statuses, 1)[:S],
    )

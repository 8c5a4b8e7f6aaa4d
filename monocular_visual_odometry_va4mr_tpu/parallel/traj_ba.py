"""Keyframe-axis trajectory bundle adjustment: contiguous keyframe segments
sharded over the device mesh with boundary-pose halo exchange via ppermute.

This is SURVEY.md §2c's sequence/context-parallel analog ("sliding-window BA
windows ... sharded over hosts, halo exchange of window-boundary poses" —
the CP/ring pattern over ICI) complementing parallel/ba_sharded.py, which
shards the LANDMARK axis inside one window.  Here the long axis is the
*trajectory*:

  Global keyframes 0 .. D*S+1 (D devices, S per device + 2 global anchors):
    kf 0,1        — global gauge anchor, frozen everywhere
    device d owns kf [2+d*S .. 1+(d+1)*S]
    device d's halo = kf [d*S, d*S+1]
                    = the global anchors      (d = 0)
                    = device d-1's last two   (d > 0), fetched by ppermute

Each device runs Schur-complement Gauss-Newton (backend/ba.py math) on its
(2 + S)-pose window with the two halo poses frozen (n_fixed=2 pins both the
rigid and monocular-scale gauge of the segment to its left neighbor).  The
halo is re-fetched EVERY iteration, so corrections propagate left-to-right
one segment per iteration — block-Jacobi relaxation with a ring exchange.
Communication per iteration: one ppermute of (2,4,4) poses per device —
128 bytes, independent of S and L.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..backend import ba
from ..core.camera import Camera


class TrajSegments(NamedTuple):
    """A keyframe-sharded trajectory BA problem (all leading axes = D).

    obs rows 0..1 of each segment are the halo keyframes' observations of
    the segment's OWN landmarks; rows 2.. are the local keyframes'.
    """

    anchor_T_CW: jnp.ndarray  # (2, 4, 4) global gauge keyframes (frozen)
    T_CW: jnp.ndarray  # (D*S, 4, 4) local keyframes, sharded on axis 0
    lm_xyz: jnp.ndarray  # (D*L, 3) per-segment landmarks, sharded
    obs_uv: jnp.ndarray  # (D, S+2, L, 2) sharded on axis 0
    obs_mask: jnp.ndarray  # (D, S+2, L) sharded on axis 0


def shard_segments(seg: TrajSegments, mesh: Mesh, axis: str = "kf"):
    sh = lambda spec: NamedSharding(mesh, spec)
    return TrajSegments(
        anchor_T_CW=jax.device_put(seg.anchor_T_CW, sh(P())),
        T_CW=jax.device_put(seg.T_CW, sh(P(axis))),
        lm_xyz=jax.device_put(seg.lm_xyz, sh(P(axis))),
        obs_uv=jax.device_put(seg.obs_uv, sh(P(axis))),
        obs_mask=jax.device_put(seg.obs_mask, sh(P(axis))),
    )


@functools.partial(
    jax.jit, static_argnames=("mesh", "axis", "iters", "huber_px", "damping")
)
def run_traj_ba(
    seg: TrajSegments,
    cam: Camera,
    *,
    mesh: Mesh,
    axis: str = "kf",
    iters: int = 8,
    huber_px: float = 3.0,
    damping: float = 1e-2,
):
    """Run ``iters`` halo-exchanged GN iterations.

    ``damping`` defaults an order stronger than single-window BA: the halo
    poses move between iterations (block-Jacobi), and undamped GN steps
    taken against a moving gauge oscillate and can diverge (measured:
    damping 1e-4 diverged on the synthetic trajectory; 1e-2 converges to
    0.3% of the initial cost in 30 iterations).

    Returns (TrajSegments with updated T_CW / lm_xyz, costs (iters,) summed
    over segments).
    """
    n_dev = mesh.shape[axis]

    def shard_fn(anchor, T_flat, lm, obs_uv, obs_mask):
        # Local blocks: T_flat (S,4,4), lm (L,3), obs_* (1, S+2, L[,2]).
        obs_uv_l = obs_uv[0]
        obs_mask_l = obs_mask[0]
        idx = lax.axis_index(axis)

        def one(carry, _):
            T_local, lm_local = carry
            # Halo: left neighbor's last two local poses (ring shift right);
            # device 0 uses the global anchors.
            shifted = lax.ppermute(
                T_local[-2:], axis,
                perm=[(i, i + 1) for i in range(n_dev - 1)],
            )
            halo = jnp.where(idx == 0, anchor, shifted)
            window = ba.BAWindow(
                T_CW=jnp.concatenate([halo, T_local], axis=0),
                lm_xyz=lm_local,
                obs_uv=obs_uv_l,
                obs_mask=obs_mask_l,
            )
            S_blk, rhs, Hpp_inv, Hcp, b_p, cost = ba.build_normal_blocks(
                window, cam, huber_px=huber_px, damping=damping)
            delta_c = ba.solve_camera_system(S_blk, rhs, n_fixed=2)
            new_window = ba.apply_updates(window, delta_c, Hpp_inv, Hcp, b_p)
            cost = lax.psum(cost, axis)
            return (new_window.T_CW[2:], new_window.lm_xyz), cost

        (T_out, lm_out), costs = lax.scan(
            one, (T_flat, lm), None, length=iters)
        return T_out, lm_out, costs

    mapped = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P()),
        check_vma=False,
    )
    # Full-f32 dots: the GN/Schur math diverges at TPU default (bf16-grade)
    # matmul precision — see backend/ba.py run_ba.
    with jax.default_matmul_precision("float32"):
        T_CW, lm_xyz, costs = mapped(
            seg.anchor_T_CW, seg.T_CW, seg.lm_xyz, seg.obs_uv, seg.obs_mask)
    return seg._replace(T_CW=T_CW, lm_xyz=lm_xyz), costs


def build_synthetic_traj(D: int, S: int, L: int, *, seed: int = 0,
                         noise_pose: float = 0.02, noise_px: float = 0.3,
                         image_shape=(480, 640)):
    """Ground-truth trajectory + per-segment landmark/observation tensors for
    tests and the scaling harness.  Returns (TrajSegments noisy, TrajSegments
    ground truth, Camera)."""
    import numpy as np

    from ..core.camera import Camera as Cam

    rng = np.random.default_rng(seed)
    H, W = image_shape
    K = np.array([[0.8 * W, 0, W / 2], [0, 0.8 * W, H / 2], [0, 0, 1]])
    cam = Cam.from_matrix(K)

    n_kf = D * S + 2
    # Forward trajectory with gentle yaw; extrinsics T_CW = inv(T_WC).
    T_WC = np.tile(np.eye(4), (n_kf, 1, 1))
    for i in range(n_kf):
        yaw = 0.004 * i
        cy, sy = np.cos(yaw), np.sin(yaw)
        T_WC[i, :3, :3] = [[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]]
        T_WC[i, :3, 3] = [0.1 * i, 0.0, 0.8 * i]
    T_CW = np.linalg.inv(T_WC)

    obs_uv = np.zeros((D, S + 2, L, 2), np.float32)
    obs_mask = np.zeros((D, S + 2, L), bool)
    lm = np.zeros((D * L, 3), np.float32)
    for d in range(D):
        kfs = [d * S, d * S + 1] + list(range(2 + d * S, 2 + (d + 1) * S))
        z0 = 0.8 * (2 + d * S)
        X = np.stack([
            rng.uniform(-8, 8, L) + 0.1 * d * S,
            rng.uniform(-2, 2, L),
            rng.uniform(z0 + 3, z0 + 0.8 * S + 25, L),
        ], 1)
        lm[d * L:(d + 1) * L] = X
        for row, kf in enumerate(kfs):
            Xc = X @ T_CW[kf, :3, :3].T + T_CW[kf, :3, 3]
            z = Xc[:, 2]
            u = K[0, 0] * Xc[:, 0] / np.maximum(z, 1e-6) + K[0, 2]
            v = K[1, 1] * Xc[:, 1] / np.maximum(z, 1e-6) + K[1, 2]
            ok = (z > 0.5) & (u >= 0) & (u < W) & (v >= 0) & (v < H)
            obs_uv[d, row, :, 0] = u + rng.normal(0, noise_px, L)
            obs_uv[d, row, :, 1] = v + rng.normal(0, noise_px, L)
            obs_mask[d, row] = ok

    gt = TrajSegments(
        anchor_T_CW=jnp.asarray(T_CW[:2], jnp.float32),
        T_CW=jnp.asarray(T_CW[2:], jnp.float32),
        lm_xyz=jnp.asarray(lm),
        obs_uv=jnp.asarray(obs_uv),
        obs_mask=jnp.asarray(obs_mask),
    )
    # Perturb everything except the anchors.
    se3_noise = rng.normal(0, noise_pose, (n_kf - 2, 6)).astype(np.float32)
    from ..core import lie

    T_noisy = jax.vmap(lambda d, T: lie.se3_exp(d) @ T)(
        jnp.asarray(se3_noise), gt.T_CW)
    noisy = gt._replace(
        T_CW=T_noisy,
        lm_xyz=gt.lm_xyz + jnp.asarray(
            rng.normal(0, 0.05, lm.shape).astype(np.float32)),
    )
    return noisy, gt, cam

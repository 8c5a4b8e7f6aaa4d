"""Distributed bundle adjustment: landmarks sharded over the device mesh,
reduced camera system all-reduced over ICI.

This is the BASELINE.json north-star design: "partitioning keyframes and map
blocks over hosts, with distributed BA via Schur-complement reduction of
landmark blocks and camera-system all-reduce/psum over ICI".

Decomposition (see backend/ba.py for the math):
  * The landmark axis L is embarrassingly parallel for everything except the
    reduced camera system: Hpp (3x3 blocks), Hcp, b_p, and the landmark
    back-substitution touch only local landmarks.
  * The only cross-shard quantities are S (W,W,6,6) and rhs (W,6) — a few
    hundred KB — reduced with ONE ``psum`` per GN iteration.  Communication
    volume is independent of L, so scaling efficiency stays high as the map
    grows (the >= 75% multi-host target).

Implemented with ``jax.shard_map`` over a 1-D mesh axis "lm"; the same code
path runs on the CPU virtual-device mesh in tests and on real TPU slices.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..backend import ba
from ..core.camera import Camera


def shard_window(window: ba.BAWindow, mesh: Mesh, axis: str = "lm"):
    """Place a BAWindow with landmark-axis sharding on the mesh."""
    lm_sharding = NamedSharding(mesh, P(axis))
    obs_sharding = NamedSharding(mesh, P(None, axis))
    rep = NamedSharding(mesh, P())
    return ba.BAWindow(
        T_CW=jax.device_put(window.T_CW, rep),
        lm_xyz=jax.device_put(window.lm_xyz, lm_sharding),
        obs_uv=jax.device_put(window.obs_uv, obs_sharding),
        obs_mask=jax.device_put(window.obs_mask, obs_sharding),
    )


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "axis", "iters", "n_fixed"),
)
def run_ba_sharded(
    window: ba.BAWindow,
    cam: Camera,
    *,
    mesh: Mesh,
    axis: str = "lm",
    iters: int = 5,
    huber_px: float = 3.0,
    damping: float = 1e-4,
    n_fixed: int = 2,
):
    """Sharded equivalent of backend.ba.run_ba; bitwise-equivalent math, with
    the landmark reduction distributed and one psum per iteration."""

    def shard_fn(T_CW, lm_xyz, obs_uv, obs_mask):
        local = ba.BAWindow(T_CW, lm_xyz, obs_uv, obs_mask)

        def one(win, _):
            S, rhs, Hpp_inv, Hcp, b_p, cost = ba.build_normal_blocks(
                win, cam, huber_px=huber_px, damping=damping
            )
            # The ONLY collectives: reduce the camera system + cost over
            # landmark shards (rides ICI on a TPU slice).
            S = jax.lax.psum(S, axis)
            rhs = jax.lax.psum(rhs, axis)
            cost = jax.lax.psum(cost, axis)
            delta_c = ba.solve_camera_system(S, rhs, n_fixed=n_fixed)
            new_win = ba.apply_updates(win, delta_c, Hpp_inv, Hcp, b_p)
            return new_win, cost

        out, costs = jax.lax.scan(one, local, None, length=iters)
        return out.T_CW, out.lm_xyz, costs

    mapped = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(axis), P(None, axis), P(None, axis)),
        out_specs=(P(), P(axis), P()),
        check_vma=False,
    )
    # GN normal equations need true f32 accumulation (TPU dots default to
    # bf16-grade precision, which NaNs the Schur solve — see backend/ba.py).
    with jax.default_matmul_precision("float32"):
        T_CW, lm_xyz, costs = mapped(
            window.T_CW, window.lm_xyz, window.obs_uv, window.obs_mask
        )
    return window._replace(T_CW=T_CW, lm_xyz=lm_xyz), costs

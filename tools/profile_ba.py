"""Time the in-step BA branch at bench sizes on the real chip.

Breaks the ~10ms-per-trigger cost (BENCH r04 kickoff measurement) into:
run_ba alone, its stages, and the full step at trigger vs non-trigger
frame indices.

Run:  python tools/profile_ba.py
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from tools.profile_step import timeit  # noqa: E402


def main():
    from monocular_visual_odometry_va4mr_tpu.backend import ba as ba_mod
    from monocular_visual_odometry_va4mr_tpu.core.camera import Camera

    W, L = 10, 256
    key = jax.random.PRNGKey(0)
    cam = Camera(fx=718.856, fy=718.856, cx=607.19, cy=185.22)

    # Plausible geometry: forward motion, landmarks in front.
    ks = jax.random.split(key, 4)
    lm = jnp.stack([
        jax.random.uniform(ks[0], (L,), minval=-20, maxval=20),
        jax.random.uniform(ks[1], (L,), minval=-5, maxval=5),
        jax.random.uniform(ks[2], (L,), minval=5, maxval=60),
    ], -1)
    T = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (W, 4, 4))
    T = T.at[:, 2, 3].set(-jnp.arange(W, dtype=jnp.float32))
    Xc = jnp.einsum("wij,lj->wli", T[:, :3, :3], lm) + T[:, None, :3, 3]
    uv = jnp.stack([cam.fx * Xc[..., 0] / Xc[..., 2] + cam.cx,
                    cam.fy * Xc[..., 1] / Xc[..., 2] + cam.cy], -1)
    mask = Xc[..., 2] > 1.0
    win = ba_mod.BAWindow(T_CW=T, lm_xyz=lm + 0.05, obs_uv=uv, obs_mask=mask)

    import functools
    f_ba2 = jax.jit(functools.partial(ba_mod.run_ba, iters=2, n_fixed=2))
    f_ba1 = jax.jit(functools.partial(ba_mod.run_ba, iters=1, n_fixed=2))
    print(f"run_ba W={W} L={L} iters=2 : {timeit(f_ba2, win, cam):8.3f} ms")
    print(f"run_ba W={W} L={L} iters=1 : {timeit(f_ba1, win, cam):8.3f} ms")

    f_blocks = jax.jit(functools.partial(ba_mod.build_normal_blocks))

    def blocks_only(w, c):
        with jax.default_matmul_precision("float32"):
            return ba_mod.build_normal_blocks(w, c)

    f_blocks = jax.jit(blocks_only)
    print(f"  build_normal_blocks    : {timeit(f_blocks, win, cam):8.3f} ms")

    S, rhs, Hpp_inv, Hcp, b_p, cost = f_blocks(win, cam)

    def solve_only(S, rhs):
        with jax.default_matmul_precision("float32"):
            return ba_mod.solve_camera_system(S, rhs, n_fixed=2)

    f_solve = jax.jit(solve_only)
    print(f"  solve_camera_system    : {timeit(f_solve, S, rhs):8.3f} ms")

    delta_c = f_solve(S, rhs)

    def apply_only(w, d, Hi, Hcp, b_p):
        with jax.default_matmul_precision("float32"):
            return ba_mod.apply_updates(w, d, Hi, Hcp, b_p)

    f_apply = jax.jit(apply_only)
    print(f"  apply_updates          : "
          f"{timeit(f_apply, win, delta_c, Hpp_inv, Hcp, b_p):8.3f} ms")

    # Full L=1024 window (no compaction) for comparison.
    L2 = 1024
    reps = L2 // L
    win2 = ba_mod.BAWindow(
        T_CW=T,
        lm_xyz=jnp.tile(lm, (reps, 1)) + 0.05,
        obs_uv=jnp.tile(uv, (1, reps, 1)),
        obs_mask=jnp.tile(mask, (1, reps)))
    print(f"run_ba W={W} L={L2} iters=2: {timeit(f_ba2, win2, cam):8.3f} ms")


if __name__ == "__main__":
    main()

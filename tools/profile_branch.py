"""Isolate the in-step BA branch: time the exact run_ba_branch body
standalone (top_k compaction + gathers + run_ba + scatters) at bench shapes.

Run:  python tools/profile_branch.py
"""
from __future__ import annotations

import dataclasses
import functools
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from tools.profile_step import timeit  # noqa: E402
from tools.profile_trigger import build  # noqa: E402


def main():
    from monocular_visual_odometry_va4mr_tpu.backend import ba as ba_mod

    ba_on = lambda c: c.replace(ba=dataclasses.replace(c.ba, every=4))
    vo, state, frames, key = build(ba_on)
    cfg = vo.config
    Wb = cfg.ba.window
    K = cfg.capacity.max_landmarks
    Kba = cfg.ba.max_landmarks
    cam = vo.cam

    lm_valid_new = state.lm_valid
    lm_gen = state.lm_gen
    new_frame = jnp.asarray(16, jnp.int32)
    slot = jnp.mod(new_frame, Wb)

    def branch(ba_T, ba_uv, ba_mask, ba_gen, lm_xyz_in):
        order = jnp.mod(slot + 1 + jnp.arange(Wb), Wb)
        Tw = ba_T[order]
        uvw = ba_uv[order]
        mw = ba_mask[order] & (ba_gen[order] == lm_gen[None, :])
        n_obs = jnp.sum(mw, axis=0)
        part = (n_obs >= cfg.ba.min_obs) & lm_valid_new
        _, sel = jax.lax.top_k(jnp.where(part, n_obs, -1), Kba)
        part_s = part[sel]
        win = ba_mod.BAWindow(
            T_CW=Tw, lm_xyz=lm_xyz_in[sel],
            obs_uv=uvw[:, sel], obs_mask=mw[:, sel] & part_s)
        out, _ = ba_mod.run_ba(win, cam, iters=cfg.ba.iters,
                               huber_px=cfg.ba.huber_px, n_fixed=2)
        upd = jnp.where(part_s[:, None], out.lm_xyz, lm_xyz_in[sel])
        lm_out = lm_xyz_in.at[sel].set(upd)
        ba_T_out = ba_T.at[order].set(out.T_CW)
        return ba_T_out, lm_out, out.T_CW[-1]

    f = jax.jit(branch)
    args = (state.ba_T, state.ba_uv, state.ba_mask, state.ba_gen,
            state.lm_xyz)
    print(f"branch body standalone : {timeit(f, *args):8.3f} ms")

    # Pieces.
    def compact(ba_uv, ba_mask, ba_gen, lm_xyz_in):
        order = jnp.mod(slot + 1 + jnp.arange(Wb), Wb)
        uvw = ba_uv[order]
        mw = ba_mask[order] & (ba_gen[order] == lm_gen[None, :])
        n_obs = jnp.sum(mw, axis=0)
        part = (n_obs >= cfg.ba.min_obs) & lm_valid_new
        _, sel = jax.lax.top_k(jnp.where(part, n_obs, -1), Kba)
        return lm_xyz_in[sel], uvw[:, sel], mw[:, sel], part[sel]

    f2 = jax.jit(compact)
    print(f"  compaction (topk+gather): "
          f"{timeit(f2, state.ba_uv, state.ba_mask, state.ba_gen, state.lm_xyz):8.3f} ms")

    lmx, uvs, mws, parts = f2(state.ba_uv, state.ba_mask, state.ba_gen,
                              state.lm_xyz)
    Tw = state.ba_T
    f3 = jax.jit(functools.partial(ba_mod.run_ba, iters=cfg.ba.iters,
                                   huber_px=cfg.ba.huber_px, n_fixed=2))
    win = ba_mod.BAWindow(T_CW=Tw, lm_xyz=lmx, obs_uv=uvs,
                          obs_mask=mws & parts)
    print(f"  run_ba                 : {timeit(f3, win, cam):8.3f} ms")


if __name__ == "__main__":
    main()

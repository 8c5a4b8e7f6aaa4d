"""Full-step cost at BA-trigger vs non-trigger frames, plus scan fps
with BA on/off — locates where the BA-on configuration loses ~2.6 ms/frame.

Run:  python tools/profile_trigger.py
"""
from __future__ import annotations

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from tools.profile_step import timeit  # noqa: E402


def build(cfg_mut):
    from monocular_visual_odometry_va4mr_tpu.core.camera import Camera
    from monocular_visual_odometry_va4mr_tpu.core.config import kitti_config
    from monocular_visual_odometry_va4mr_tpu.dataio import synthetic
    from monocular_visual_odometry_va4mr_tpu.pipeline.vo import VisualOdometry

    cfg = kitti_config().replace(bootstrap_method="klt")
    cfg = cfg.replace(
        detector=dataclasses.replace(cfg.detector, quality_level=0.03))
    cfg = cfg_mut(cfg)
    H, W = cfg.image_shape
    scene = synthetic.make_textured_scene(
        seed=11, num_frames=40, image_shape=(H, W), step=1.0)
    tag = f"textured-s11-f40-{H}x{W}"
    frames = [jnp.asarray(f, jnp.float32)
              for f in synthetic.render_all_cached(scene, tag)]
    vo = VisualOdometry(Camera.from_matrix(scene.K), cfg)
    key = jax.random.PRNGKey(0)
    state = vo.bootstrap(frames[0], frames[4], key, intermediate=frames[1:4])
    for i in range(5, 14):
        state = vo.step(state, frames[i], jax.random.fold_in(key, i))
    jax.block_until_ready(state.T_CW)
    return vo, state, frames, key


def main():
    ba_on = lambda c: c.replace(ba=dataclasses.replace(c.ba, every=4))
    vo, state, frames, key = build(ba_on)
    img = frames[14]

    # frame_idx such that new_frame = idx+1; trigger iff new_frame % 4 == 0
    # and new_frame >= window(10).
    s_trig = state.replace(frame_idx=jnp.asarray(15, jnp.int32))  # 16 % 4 == 0
    s_skip = state.replace(frame_idx=jnp.asarray(16, jnp.int32))  # 17 % 4 != 0
    step = lambda s: vo._step(s, img, key)
    print(f"step BA-on  trigger frame : {timeit(step, s_trig):8.3f} ms")
    print(f"step BA-on  skip frame    : {timeit(step, s_skip):8.3f} ms")

    from monocular_visual_odometry_va4mr_tpu.pipeline import scan_driver
    imgs = jnp.stack(frames[14:])
    keys = jax.random.split(jax.random.fold_in(key, 99), imgs.shape[0])
    run = scan_driver.make_scan_step(vo)
    runc = run.lower(state, imgs, keys).compile()
    runc(state, imgs, keys)
    t0 = time.perf_counter()
    out = runc(state, imgs, keys)
    jax.block_until_ready(out[0].T_CW)
    dt = time.perf_counter() - t0
    n = imgs.shape[0]
    print(f"scan BA-on : {dt/n*1e3:8.3f} ms/frame ({n/dt:6.1f} fps)")

    vo0, state0, frames0, key0 = build(lambda c: c)
    run0 = scan_driver.make_scan_step(vo0)
    run0c = run0.lower(state0, imgs, keys).compile()
    run0c(state0, imgs, keys)
    t0 = time.perf_counter()
    out = run0c(state0, imgs, keys)
    jax.block_until_ready(out[0].T_CW)
    dt = time.perf_counter() - t0
    print(f"scan BA-off: {dt/n*1e3:8.3f} ms/frame ({n/dt:6.1f} fps)")
    step0 = lambda s: vo0._step(s, img, key0)
    print(f"step BA-off               : {timeit(step0, state0):8.3f} ms")


if __name__ == "__main__":
    main()

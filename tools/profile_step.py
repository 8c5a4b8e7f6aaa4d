"""Per-stage wall-clock profile of one VO step on the real chip.

Times each stage of ``VisualOdometry._step_impl`` as an independently-jitted
function (median of ``reps`` timed calls after warmup) plus the fused full
step, the scan-driver amortized cost, and prints a table.  This is the
breakdown VERDICT.md round 1 asked for ("no per-stage profile exists").

Run:  python tools/profile_step.py [--dataset parking] [--frames 24]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=20, warmup=3):
    """Pipelined timing: issue ``reps`` async dispatches, block once.

    The axon tunnel adds ~25 ms RPC latency to every *blocking* round trip;
    pipelining amortizes it so (t_total - t_1) / (reps - 1) approximates the
    pure device execution time per call.
    """
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)

    def run_n(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        return time.perf_counter() - t0

    t_few = min(run_n(2) for _ in range(2))
    t_many = min(run_n(2 + reps) for _ in range(2))
    return float((t_many - t_few) / reps * 1e3)  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="parking")
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--scan", action="store_true", help="also time lax.scan driver")
    args = ap.parse_args()

    from monocular_visual_odometry_va4mr_tpu.core.camera import Camera
    from monocular_visual_odometry_va4mr_tpu.core.config import PRESETS
    from monocular_visual_odometry_va4mr_tpu.dataio import synthetic
    from monocular_visual_odometry_va4mr_tpu.ops import (corners, klt_pallas,
                                                         pnp, triangulate)
    from monocular_visual_odometry_va4mr_tpu.pipeline import VisualOdometry

    cfg = PRESETS[args.dataset]().replace(bootstrap_method="klt")
    H, W = cfg.image_shape
    n_frames = max(args.frames, 12)
    scene = synthetic.make_textured_scene(
        seed=11, num_frames=n_frames, image_shape=(H, W), step=1.0)
    tag = f"textured-s11-f{n_frames}-{H}x{W}"
    frames = [jnp.asarray(f, jnp.float32)
              for f in synthetic.render_all_cached(scene, tag)]
    cam = Camera.from_matrix(scene.K)
    vo = VisualOdometry(cam, cfg)
    key = jax.random.PRNGKey(0)

    state = vo.bootstrap(frames[0], frames[4], key, intermediate=frames[1:4])
    for i in range(5, 10):
        state = vo.step(state, frames[i], jax.random.fold_in(key, i))
    jax.block_until_ready(state.T_CW)
    img = frames[10]

    rows = []

    # -- stage: pyramid --
    f_pyr = jax.jit(vo.make_pyramid)
    rows.append(("pyramid", timeit(f_pyr, img)))
    pyr = jax.block_until_ready(f_pyr(img))

    # -- stage: coarse flow volume --
    ci0 = state.prev_pyramid[-1]
    ci1 = pyr[-1]
    f_cfv = jax.jit(klt_pallas.coarse_flow_volume)
    rows.append(("klt/coarse_volume", timeit(f_cfv, ci0, ci1)))
    flow_c = jax.block_until_ready(f_cfv(ci0, ci1))

    # -- stage: prior sampling --
    all_pts = jnp.concatenate([state.lm_uv, state.cand_uv], axis=0)
    all_valid = jnp.concatenate([state.lm_valid, state.cand_valid], axis=0)
    scale = float(round(H / ci0.shape[0]))
    f_samp = jax.jit(lambda fm, p: klt_pallas.sample_map_onehot(fm, p / scale))
    rows.append(("klt/prior_sample", timeit(f_samp, flow_c, all_pts)))

    # -- stage: full KLT (pallas path incl. volume) --
    f_klt = jax.jit(functools.partial(
        vo._track))
    rows.append(("klt/total", timeit(f_klt, state.prev_pyramid, pyr,
                                     all_pts, all_valid)))

    # -- stage: KLT + forward-backward gate (what the step actually runs) --
    f_klt_fb = jax.jit(vo._track_fb)
    rows.append(("klt/total+fb", timeit(f_klt_fb, state.prev_pyramid, pyr,
                                        all_pts, all_valid)))
    new_pts, tracked, _ = f_klt(state.prev_pyramid, pyr, all_pts, all_valid)
    K = cfg.capacity.max_landmarks
    lm_uv, lm_valid = new_pts[:K], tracked[:K]
    cand_uv, cand_valid = new_pts[K:], tracked[K:]

    # -- stage: PnP RANSAC --
    f_pnp = jax.jit(functools.partial(
        pnp.solve_pnp_ransac,
        iterations=cfg.pnp.iterations,
        reproj_threshold_px=cfg.pnp.reproj_err_px,
        refine_iters=cfg.pnp.refine_iters,
        min_points=cfg.pnp.min_points))
    rows.append(("pnp_ransac", timeit(
        f_pnp, key, vo.cam, state.lm_xyz, lm_uv, lm_valid)))
    T_CW, _, _ = f_pnp(key, vo.cam, state.lm_xyz, lm_uv, lm_valid)

    # -- stage: triangulate candidates --
    age = state.frame_idx + 1 - state.cand_first_frame
    f_tri = jax.jit(functools.partial(
        triangulate.triangulate_candidates,
        min_baseline_frames=cfg.landmarks.min_baseline_frames,
        min_baseline_angle_deg=cfg.landmarks.min_baseline_angle_deg,
        min_dist=cfg.landmarks.min_dist,
        max_dist=cfg.landmarks.max_dist))
    rows.append(("triangulate", timeit(
        f_tri, vo.cam, state.cand_first_uv, cand_uv, state.cand_T_CW_first,
        T_CW, cand_valid, age)))

    # -- stage: landmark re-triangulation (sliding anchors) --
    f_re = jax.jit(functools.partial(
        triangulate.triangulate_candidates,
        min_baseline_frames=cfg.landmarks.min_baseline_frames,
        min_baseline_angle_deg=cfg.landmarks.min_baseline_angle_deg,
        min_dist=cfg.landmarks.min_dist,
        max_dist=cfg.landmarks.max_dist, enforce_age=False))
    rows.append(("lm_retriangulate", timeit(
        f_re, vo.cam, state.lm_first_uv, lm_uv, state.lm_T_CW_first,
        T_CW, lm_valid, jnp.zeros_like(state.lm_anchor_age))))

    # -- stage: corner detection --
    det = cfg.detector
    f_det = jax.jit(functools.partial(
        corners.detect_corners, max_corners=det.max_corners,
        quality_level=det.quality_level, cell=int(det.min_dist),
        block_size=det.block_size, use_harris=det.use_harris))
    rows.append(("detect_corners", timeit(f_det, img)))
    det_uv, _, det_valid = f_det(img)

    # -- stage: dedup matrix --
    @jax.jit
    def dedup(det_uv, det_valid, cand_uv, cand_valid, lm_uv, lm_valid):
        d2c = jnp.sum((det_uv[:, None, :] - cand_uv[None, :, :]) ** 2, axis=-1)
        d2l = jnp.sum((det_uv[:, None, :] - lm_uv[None, :, :]) ** 2, axis=-1)
        md = cfg.detector.min_dist
        fc = jnp.all(jnp.where(cand_valid[None, :], d2c, jnp.inf) > md ** 2, axis=1)
        fl = jnp.all(jnp.where(lm_valid[None, :], d2l, jnp.inf) > md ** 2, axis=1)
        return det_valid & fc & fl
    rows.append(("dedup_matrix", timeit(
        dedup, det_uv, det_valid, cand_uv, cand_valid, lm_uv, lm_valid)))

    # -- fused full step --
    step_ms = timeit(lambda s, im: vo._step(s, im, key), state, img)
    rows.append(("FULL STEP (jit)", step_ms))

    total = sum(ms for name, ms in rows if not name.startswith("FULL"))
    print(f"\n{'stage':24s} {'ms':>8s}  {'% of step':>9s}")
    for name, ms in rows:
        print(f"{name:24s} {ms:8.3f}  {100 * ms / step_ms:8.1f}%")
    print(f"{'sum of stages':24s} {total:8.3f}")

    if args.scan:
        from monocular_visual_odometry_va4mr_tpu.pipeline import scan_driver
        F = len(frames) - 10
        imgs = jnp.stack(frames[10:10 + F])
        keys = jax.random.split(jax.random.fold_in(key, 99), F)
        run = scan_driver.make_scan_step(vo)
        final, outs = run(state, imgs, keys)
        jax.block_until_ready(final.T_CW)
        t0 = time.perf_counter()
        final, outs = run(state, imgs, keys)
        jax.block_until_ready(final.T_CW)
        dt = time.perf_counter() - t0
        print(f"\nscan driver: {F} frames in {dt*1e3:.1f} ms -> "
              f"{dt / F * 1e3:.3f} ms/frame ({F / dt:.1f} fps)")


if __name__ == "__main__":
    main()

"""End-to-end health diagnostic: run the pipeline on a synthetic scene and
report per-frame status, landmark counts, and final ATE — the check the
bench asserts before it prints any fps number.

Usage:
  python tools/diag_e2e.py --scene textured --backend pallas2 --frames 80
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(scene_kind: str, backend: str, num_frames: int, image_shape,
        bootstrap_stride: int = 4, verbose: bool = True, seed: int = 11,
        recover: bool = True, quality: float = None, fb: float = None,
        preset: str = "parking", ba_every: int = 0, ba_window: int = 8):
    import jax

    from monocular_visual_odometry_va4mr_tpu.core.camera import Camera
    from monocular_visual_odometry_va4mr_tpu.core.config import parking_config
    from monocular_visual_odometry_va4mr_tpu.dataio import synthetic
    from monocular_visual_odometry_va4mr_tpu.evalx import ate
    from monocular_visual_odometry_va4mr_tpu.pipeline import runner
    from monocular_visual_odometry_va4mr_tpu.pipeline.vo import VisualOdometry

    if scene_kind == "textured":
        scene = synthetic.make_textured_scene(
            seed=seed, num_frames=num_frames, image_shape=image_shape,
            step=1.0)
    else:
        num_points = int((num_frames * 1.0 + 60.0) * 75)
        scene = synthetic.make_corridor_scene(
            seed=seed, num_frames=num_frames, num_points=num_points,
            image_shape=image_shape, step=1.0)

    t0 = time.time()
    tag = f"{scene_kind}-s{seed}-f{num_frames}-{image_shape[0]}x{image_shape[1]}"
    frames = synthetic.render_all_cached(scene, tag)
    print(f"rendered {num_frames} frames in {time.time()-t0:.1f}s")

    import dataclasses

    from monocular_visual_odometry_va4mr_tpu.core.config import PRESETS

    cfg = PRESETS[preset]().replace(image_shape=scene.image_shape,
                                    bootstrap_method="klt")
    cfg = cfg.replace(klt=dataclasses.replace(cfg.klt, backend=backend))
    if quality is not None:
        cfg = cfg.replace(
            detector=dataclasses.replace(cfg.detector, quality_level=quality))
    if fb is not None:
        cfg = cfg.replace(klt=dataclasses.replace(cfg.klt, fb_max_err_px=fb))
    vo = VisualOdometry(Camera.from_matrix(scene.K), cfg)

    result = runner.run_sequence(
        vo, ((i, f) for i, f in enumerate(frames)),
        bootstrap_stride=bootstrap_stride, verbose=verbose, recover=recover,
        ba_every=ba_every, ba_window=ba_window)

    est = result.positions
    gt = scene.poses_WC[[r.frame for r in result.records], :3, 3]
    lost = result.num_lost()
    finite = np.all(np.isfinite(est))
    rmse = float("nan")
    if finite:
        rmse = ate.ate_rmse(est, gt)
    print(f"\n== {scene_kind}/{backend}: frames={len(result.records)} "
          f"lost={lost} finite={finite} ate_rmse={rmse:.3f} "
          f"fps={result.frames_per_sec:.1f}")
    return result, rmse, lost


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="textured",
                    choices=["textured", "blob"])
    ap.add_argument("--backend", default="pallas2",
                    choices=["pallas2", "pallas", "xla", "auto"])
    ap.add_argument("--frames", type=int, default=80)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--stride", type=int, default=4)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--quiet", action="store_true")
    ap.add_argument("--no-recover", action="store_true")
    ap.add_argument("--quality", type=float, default=None)
    ap.add_argument("--fb", type=float, default=None)
    ap.add_argument("--preset", default="parking")
    ap.add_argument("--ba-every", type=int, default=0)
    ap.add_argument("--ba-window", type=int, default=8)
    a = ap.parse_args()
    run(a.scene, a.backend, a.frames, (a.height, a.width),
        bootstrap_stride=a.stride, verbose=not a.quiet, seed=a.seed,
        recover=not a.no_recover, quality=a.quality, fb=a.fb,
        preset=a.preset, ba_every=a.ba_every, ba_window=a.ba_window)

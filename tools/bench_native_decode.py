"""Drive the native PNG decode path at full KITTI scale (round-3 verdict
next-step #10 / SURVEY "hard parts" #6).

1. Renders the bench scene (95 frames, 376x1241), writes it to disk in the
   KITTI layout the loader expects (datasets.load_kitti: <root>/05/image_0/
   {i:06d}.png + <root>/poses/05.txt).
2. Measures native decode throughput through dataio/native_io.py's
   PrefetchingReader (the libmvo_io.so zlib decoder + thread pool) vs the
   >=300 fps device consumption rate.
3. Runs the VO pipeline once on frames streamed from disk through the
   native decoder and once on the identical in-memory uint8 frames, and
   asserts the trajectories are IDENTICAL (PNG is lossless on uint8).

Usage:  python tools/bench_native_decode.py [--keep]
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")
import bench


def write_kitti_layout(root, scene, frames_u8):
    import cv2

    img_dir = os.path.join(root, "05", "image_0")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(os.path.join(root, "poses"), exist_ok=True)
    for i, f in enumerate(frames_u8):
        assert cv2.imwrite(os.path.join(img_dir, f"{i:06d}.png"), f)
    rows = scene.poses_WC[:len(frames_u8), :3, :4].reshape(len(frames_u8), 12)
    np.savetxt(os.path.join(root, "poses", "05.txt"), rows)


def run_pipeline(spec_frames, scene, n):
    """Run bootstrap + steps over an (idx, frame) iterator; returns poses."""
    import jax
    import jax.numpy as jnp

    from monocular_visual_odometry_va4mr_tpu.core.camera import Camera
    from monocular_visual_odometry_va4mr_tpu.core.config import kitti_config
    from monocular_visual_odometry_va4mr_tpu.pipeline.vo import VisualOdometry
    import dataclasses

    cfg = kitti_config().replace(image_shape=scene.image_shape,
                                 bootstrap_method="klt")
    cfg = cfg.replace(
        detector=dataclasses.replace(cfg.detector, quality_level=0.03),
        ba=dataclasses.replace(cfg.ba, every=4))
    vo = VisualOdometry(Camera.from_matrix(scene.K), cfg)
    key = jax.random.PRNGKey(0)
    b = bench.BOOTSTRAP_STRIDE

    frames = {}
    it = iter(spec_frames)
    while len(frames) <= b:
        i, f = next(it)
        frames[i] = jnp.asarray(f, jnp.float32)
    state = vo.bootstrap(frames[0], frames[b], jax.random.fold_in(key, 0),
                         intermediate=[frames[j] for j in range(1, b)])
    poses = [np.asarray(state.T_CW)]
    for i, f in it:
        if i >= n:
            break
        state = vo.step(state, jnp.asarray(f, jnp.float32),
                        jax.random.fold_in(key, i))
        poses.append(np.asarray(state.T_CW))
    return np.stack(poses)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--frames", type=int, default=bench.NUM_FRAMES)
    args = ap.parse_args()

    from monocular_visual_odometry_va4mr_tpu.dataio import datasets, native_io

    assert native_io.available(), "libmvo_io.so not built/loadable"

    scene, frames = bench.render_scene()
    n = min(args.frames, len(frames))
    frames_u8 = [np.clip(f, 0, 255).astype(np.uint8) for f in frames[:n]]

    root = tempfile.mkdtemp(prefix="kitti_synth_")
    try:
        write_kitti_layout(root, scene, frames_u8)

        spec = datasets.load_kitti(root, "05")
        assert spec.num_frames == n

        # --- decode throughput: native prefetching reader, cold stream ---
        t0 = time.perf_counter()
        count = 0
        ref0 = None
        for i, img in spec.frames(prefetch=True):
            count += 1
            if i == 0:
                ref0 = img
        dt = time.perf_counter() - t0
        decode_fps = count / dt
        assert count == n
        assert np.array_equal(ref0, frames_u8[0]), "decode mismatch vs source"

        # --- trajectory identity: disk->native decode vs in-memory ---
        poses_disk = run_pipeline(spec.frames(prefetch=True), scene, n)
        poses_mem = run_pipeline(enumerate(frames_u8), scene, n)
        identical = bool(np.array_equal(poses_disk, poses_mem))
        max_diff = float(np.max(np.abs(poses_disk - poses_mem)))

        print(json.dumps({
            "decode_fps": round(decode_fps, 1),
            "frames": n,
            "resolution": list(scene.image_shape),
            "device_rate_target_fps": 300,
            "decode_keeps_up": decode_fps >= 300,
            "trajectory_identical": identical,
            "max_pose_diff": max_diff,
        }))
        if not identical or decode_fps < 300:
            sys.exit(2)
    finally:
        if args.keep:
            print(f"kept: {root}", file=sys.stderr)
        else:
            shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()

"""Sustained long-sequence throughput: the streaming block driver
(pipeline/scan_driver.run_streaming) at reference scale.

The headline bench times one 88-frame scan; the reference's real workload
is 2761 KITTI frames (reference main.py:17).  This measures the SUSTAINED
rate — state carried across fixed-shape scan blocks, host stacking/upload
of block k+1 overlapped with device compute of block k — over a long
rendered sequence, health-gated like bench.py (ATE bound = the reference's
own long-run ATE on identical frames: monocular scale drift dominates
everyone at this length).

NOTE on sustained_fps in THIS container: frames reach the chip through the
axon tunnel, so the number is H2D-transfer-bound (~18 fps for 1.9 MB
frames), not device-bound — the same executable sustains 360+ fps when
frames are device-resident (bench.py).  On local PCIe/HBM attach the
upload is ~0.2 ms/frame and compute dominates.

Usage:  python tools/bench_stream.py [--frames 384] [--block 64]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=384)
    ap.add_argument("--block", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from monocular_visual_odometry_va4mr_tpu.core.camera import Camera
    from monocular_visual_odometry_va4mr_tpu.core.config import (
        kitti_tuned_config)
    from monocular_visual_odometry_va4mr_tpu.dataio import synthetic
    from monocular_visual_odometry_va4mr_tpu.evalx import ate
    from monocular_visual_odometry_va4mr_tpu.pipeline import scan_driver
    from monocular_visual_odometry_va4mr_tpu.pipeline.vo import VisualOdometry

    N = args.frames
    scene = synthetic.make_textured_scene(
        seed=11, num_frames=N, image_shape=(376, 1241), step=1.0)
    frames = synthetic.render_all_cached(scene, f"stream-s11-f{N}-376x1241")

    cfg = kitti_tuned_config().replace(image_shape=scene.image_shape,
                                       bootstrap_method="klt")
    cfg = cfg.replace(
        detector=dataclasses.replace(cfg.detector, quality_level=0.01))
    vo = VisualOdometry(Camera.from_matrix(scene.K), cfg)
    key = jax.random.PRNGKey(0)

    b = 4
    dev = [jnp.asarray(f, jnp.float32) for f in frames[: b + 1]]
    state = vo.bootstrap(dev[0], dev[b], jax.random.fold_in(key, 0),
                         intermediate=dev[1:b])
    jax.block_until_ready(state.T_CW)

    # Warm the block executable (compile outside the timed region).
    warm = ((i, frames[i]) for i in range(b + 1, b + 1 + args.block))
    state, _, _, _ = scan_driver.run_streaming(vo, state, warm, key,
                                               block=args.block)
    jax.block_until_ready(state.T_CW)

    start = b + 1 + args.block
    stream = ((i, frames[i]) for i in range(start, N))
    t0 = time.perf_counter()
    state, outs, frame_ids, sinfo = scan_driver.run_streaming(
        vo, state, stream, key, block=args.block, recover=True)
    jax.block_until_ready(outs.T_CW)
    dt = time.perf_counter() - t0
    n = len(frame_ids)
    fps = n / dt

    T = np.asarray(outs.T_CW)
    est = np.stack([-t[:3, :3].T @ t[:3, 3] for t in T])
    gt = scene.poses_WC[frame_ids, :3, 3]
    lost = int((np.asarray(outs.status) != 0).sum())
    finite = bool(np.all(np.isfinite(est)))
    a = float(ate.ate_rmse(est, gt)) if finite else float("nan")
    path = float(np.sum(np.linalg.norm(np.diff(gt, axis=0), axis=1)))

    # Reference on the same frames (same health logic as bench.py): at
    # this length monocular scale drift dominates everyone; the honest
    # bound is the reference's own long-run ATE.
    sys.path.insert(0, "tools")
    from run_reference import run_reference

    ref = run_reference(scene, frames, bootstrap=(0, b), quality=0.01,
                        reproj_err=8.0, max_dist=150)
    ref_ate = float("nan")
    if ref["completed"] >= 8:
        ref_gt = scene.poses_WC[ref["frame_ids"], :3, 3]
        ref_ate = float(ate.ate_rmse(ref["positions"], ref_gt))
    bound = max(0.02 * path,
                ref_ate if np.isfinite(ref_ate)
                and ref["completed"] == ref["total"] else 0.0)

    healthy = lost == 0 and finite and a <= bound
    print(json.dumps({
        "streamed_frames": n, "block": args.block,
        "sustained_fps": round(fps, 1), "lost": lost,
        "ate_rmse": round(a, 4), "path_m": round(path, 1),
        "ref_ate": round(ref_ate, 2),
        "ref_completed": f"{ref['completed']}/{ref['total']}",
        "ate_bound": round(bound, 2),
        "healthy": healthy,
    }))
    sys.exit(0 if healthy else 2)


if __name__ == "__main__":
    main()

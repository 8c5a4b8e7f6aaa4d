"""Per-dataset on-chip benchmarks: the Malaga (800x600) and Parking
(480x640) presets next to the KITTI one (round-4 verdict missing #4 — only
the KITTI geometry had an on-chip artifact; the other presets' KLT window /
max_level now drive the Pallas chain directly, pipeline/vo.py).

For each preset geometry: render a textured scene at that resolution/K,
run the compiled scan on the TPU (health-gated), and run the unmodified
reference on identical frames with that dataset's own parameters
(reference main.py:50-74 Malaga, :76-104 Parking).

Usage: python tools/bench_datasets.py [--frames 95] [--datasets kitti,malaga,parking]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


PRESETS = {
    # (image_shape, preset_fn_name, ref reproj_err, bootstrap stride)
    # kitti_tuned_config, not tune_for_tpu(kitti_config()): the tuned
    # preset pins mid_iters=0 (geometry-specific, see KLTConfig.mid_iters).
    "kitti": ((376, 1241), "kitti_tuned_config", 8.0, 4),
    "malaga": ((600, 800), "malaga_config", 5.0, 4),
    "parking": ((480, 640), "parking_config", 5.0, 4),
}


def bench_one(name, frames_n):
    import jax
    import jax.numpy as jnp

    from monocular_visual_odometry_va4mr_tpu.core import config as cfgmod
    from monocular_visual_odometry_va4mr_tpu.core.camera import Camera
    from monocular_visual_odometry_va4mr_tpu.dataio import synthetic
    from monocular_visual_odometry_va4mr_tpu.evalx import ate
    from monocular_visual_odometry_va4mr_tpu.pipeline import scan_driver
    from monocular_visual_odometry_va4mr_tpu.pipeline.vo import VisualOdometry

    shape, preset, reproj, b = PRESETS[name]
    scene = synthetic.make_textured_scene(
        seed=11, num_frames=frames_n, image_shape=shape, step=1.0)
    frames = synthetic.render_all_cached(
        scene, f"bench-{name}-s11-f{frames_n}-{shape[0]}x{shape[1]}")

    cfg = cfgmod.tune_for_tpu(getattr(cfgmod, preset)()).replace(
        image_shape=shape, bootstrap_method="klt")
    cfg = cfg.replace(
        detector=dataclasses.replace(cfg.detector, quality_level=0.03))
    vo = VisualOdometry(Camera.from_matrix(scene.K), cfg)
    key = jax.random.PRNGKey(0)
    dev = [jnp.asarray(f, jnp.float32) for f in frames]
    state = vo.bootstrap(dev[0], dev[b], jax.random.fold_in(key, 0),
                         intermediate=dev[1:b])
    jax.block_until_ready(state.T_CW)

    start = 12
    for i in range(b + 1, start):
        state = vo.step(state, dev[i], jax.random.fold_in(key, i))
    images = jnp.stack(dev[start:])
    keys = jnp.stack([jax.random.fold_in(key, i)
                      for i in range(start, frames_n)])
    run = scan_driver.make_scan_step(vo)
    run_c = run.lower(state, images, keys).compile()
    jax.block_until_ready(run_c(state, images, keys)[1].T_CW)
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _, outs = run_c(state, images, keys)
        jax.block_until_ready(outs.T_CW)
        dt = min(dt, time.perf_counter() - t0)
    fps = images.shape[0] / dt

    T = np.asarray(outs.T_CW)
    est = np.stack([-t[:3, :3].T @ t[:3, 3] for t in T])
    ids = list(range(start, frames_n))
    gt = scene.poses_WC[ids, :3, 3]
    lost = int((np.asarray(outs.status) != 0).sum())
    a = float(ate.ate_rmse(est, gt)) if np.all(np.isfinite(est)) \
        else float("nan")
    path = float(np.sum(np.linalg.norm(np.diff(gt, axis=0), axis=1)))

    sys.path.insert(0, "tools")
    from run_reference import run_reference

    r = run_reference(scene, frames, bootstrap=(0, b), quality=0.01,
                      reproj_err=reproj, max_dist=150)
    ref_ate = float("nan")
    if r["completed"] >= 8:
        ref_ate = float(ate.ate_rmse(
            r["positions"], scene.poses_WC[r["frame_ids"], :3, 3]))

    bound = 0.02 * path
    if np.isfinite(ref_ate) and r["completed"] == r["total"]:
        bound = max(bound, ref_ate)
    healthy = lost == 0 and np.isfinite(a) and a <= bound
    return {
        "dataset": name, "resolution": list(shape),
        "klt_window": cfg.klt.window, "klt_max_level": cfg.klt.max_level,
        "fps": round(fps, 1), "lost": lost, "ate_rmse": round(a, 3),
        "ate_bound": round(bound, 3),
        "ref_fps": round(float(r["fps"]), 1),
        "ref_ate": round(ref_ate, 3) if np.isfinite(ref_ate) else None,
        "ref_completed": f"{r['completed']}/{r['total']}",
        "vs_ref": round(fps / r["fps"], 1) if r["fps"] == r["fps"] else None,
        "healthy": healthy,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=95)
    ap.add_argument("--datasets", default="kitti,malaga,parking")
    ap.add_argument("--out", default="BENCH_datasets.json")
    args = ap.parse_args()
    out = []
    for name in args.datasets.split(","):
        res = bench_one(name.strip(), args.frames)
        print(json.dumps(res), flush=True)
        out.append(res)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    ok = all(r["healthy"] for r in out)
    sys.exit(0 if ok else 2)


if __name__ == "__main__":
    main()

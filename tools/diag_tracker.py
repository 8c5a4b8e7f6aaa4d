"""Tracker A/B diagnostic: pallas2 / pallas / xla on one textured frame pair.

Tracks identical corner sets, reports acceptance counts, error vs the XLA
oracle, and error vs ground-truth optical flow (exact from scene geometry via
depth + pose — for textured planes every pixel's GT flow is computable).
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def gt_flow(scene, frame0, frame1, uv):
    """Exact GT correspondence for pixels uv in frame0 -> frame1 by
    ray-casting depth in frame0 and reprojecting into frame1."""
    K = scene.K
    T0 = scene.poses_WC[frame0]
    T1_CW = scene.pose_CW(frame1)
    d_cam = np.stack([(uv[:, 0] - K[0, 2]) / K[0, 0],
                      (uv[:, 1] - K[1, 2]) / K[1, 1],
                      np.ones(len(uv))], axis=-1)
    d = d_cam @ T0[:3, :3].T
    cam = T0[:3, 3]
    INF = 1e18
    best_t = np.full(len(uv), INF)
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (scene.ground_y - cam[1]) / d[:, 1]
        ok = (d[:, 1] > 1e-9) & (t > 0.2)
        best_t = np.where(ok & (t < best_t), t, best_t)
        for sgn in (-1.0, 1.0):
            t = (sgn * scene.half_width - cam[0]) / d[:, 0]
            p = cam + t[:, None] * d
            ok = (np.abs(d[:, 0]) > 1e-9) & (t > 0.2) & (p[:, 1] < scene.ground_y)
            best_t = np.where(ok & (t < best_t), t, best_t)
        for pz, x0, x1, y0, y1 in scene.pillars:
            t = (pz - cam[2]) / d[:, 2]
            p = cam + t[:, None] * d
            ok = ((np.abs(d[:, 2]) > 1e-9) & (t > 0.2)
                  & (p[:, 0] >= x0) & (p[:, 0] <= x1)
                  & (p[:, 1] >= y0) & (p[:, 1] <= y1))
            best_t = np.where(ok & (t < best_t), t, best_t)
    X = cam + best_t[:, None] * d  # world hit
    Xc = X @ T1_CW[:3, :3].T + T1_CW[:3, 3]
    z = Xc[:, 2]
    u1 = K[0, 0] * Xc[:, 0] / z + K[0, 2]
    v1 = K[1, 1] * Xc[:, 1] / z + K[1, 2]
    return np.stack([u1, v1], -1), best_t < INF


def main(pair=(10, 11), image_shape=(480, 640), seed=11, num_frames=20):
    import jax
    import jax.numpy as jnp

    from monocular_visual_odometry_va4mr_tpu.dataio import synthetic
    from monocular_visual_odometry_va4mr_tpu.ops import (corners,
                                                         image as imops, klt,
                                                         klt_pallas,
                                                         klt_pallas2)

    scene = synthetic.make_textured_scene(seed=seed, num_frames=num_frames,
                                          image_shape=image_shape, step=1.0)
    f0 = jnp.asarray(scene.render(pair[0]), jnp.float32)
    f1 = jnp.asarray(scene.render(pair[1]), jnp.float32)

    uv, _, valid = corners.detect_corners(f0, max_corners=512,
                                          quality_level=0.03, cell=10,
                                          block_size=3, use_harris=False,
                                          harris_k=0.04)
    uv = np.asarray(uv)
    valid = np.asarray(valid)
    print(f"{valid.sum()} corners")

    gt, gt_ok = gt_flow(scene, pair[0], pair[1], uv)
    flow_mag = np.linalg.norm(gt - uv, axis=1)
    print(f"GT flow px: median={np.median(flow_mag[valid & gt_ok]):.2f} "
          f"p90={np.percentile(flow_mag[valid & gt_ok], 90):.2f} "
          f"max={flow_mag[valid & gt_ok].max():.2f}")

    pyr0_multi = imops.build_pyramid(f0, 5)
    pyr1_multi = imops.build_pyramid(f1, 5)
    pyr0_flat = imops.build_flat_pyramid(f0, 16)
    pyr1_flat = imops.build_flat_pyramid(f1, 16)

    uvj = jnp.asarray(uv)
    vj = jnp.asarray(valid)

    results = {}
    p, ok, _ = klt.track_features(pyr0_multi, pyr1_multi, uvj, vj,
                                  window=15, num_iters=20, eps=0.01,
                                  min_eig_threshold=1e-4, max_residual=20.0)
    results["xla"] = (np.asarray(p), np.asarray(ok))
    if jax.default_backend() == "tpu":
        for name, fn in (("pallas", klt_pallas.track_features_pallas),
                         ("pallas2", klt_pallas2.track_features_pallas2)):
            p, ok, _ = fn(pyr0_flat, pyr1_flat, uvj, vj, num_iters=8,
                          eps=0.01, min_eig_threshold=1e-4,
                          max_residual=20.0)
            results[name] = (np.asarray(p), np.asarray(ok))
        p, ok, _ = klt_pallas2.track_multilevel(
            pyr0_flat, pyr1_flat, uvj, vj, num_iters=8, eps=0.01,
            min_eig_threshold=1e-4, max_residual=20.0)
        results["pallas2_ml"] = (np.asarray(p), np.asarray(ok))
        # + forward-backward gate (what pipeline/vo._track_fb applies).
        pb, okb, _ = klt_pallas2.track_multilevel(
            pyr1_flat, pyr0_flat, p, ok, num_iters=8, eps=0.01,
            min_eig_threshold=1e-4, max_residual=20.0)
        fb2 = np.sum((np.asarray(pb) - uv) ** 2, axis=-1)
        results["pallas2_fb"] = (np.asarray(p),
                                 np.asarray(ok) & np.asarray(okb) & (fb2 < 1.0))
    # XLA + FB for comparison.
    pb, okb, _ = klt.track_features(pyr1_multi, pyr0_multi,
                                    jnp.asarray(results["xla"][0]),
                                    jnp.asarray(results["xla"][1]),
                                    window=15, num_iters=20, eps=0.01,
                                    min_eig_threshold=1e-4, max_residual=20.0)
    fb2 = np.sum((np.asarray(pb) - uv) ** 2, axis=-1)
    results["xla_fb"] = (results["xla"][0],
                         results["xla"][1] & np.asarray(okb) & (fb2 < 1.0))

    for name, (p, ok) in results.items():
        m = ok & gt_ok
        err = np.linalg.norm(p - gt, axis=1)
        acc = ok.sum()
        if m.sum():
            print(f"{name:8s}: accepted={acc:4d}  "
                  f"err-vs-GT: med={np.median(err[m]):.3f} "
                  f"p90={np.percentile(err[m], 90):.3f} "
                  f">3px={(err[m] > 3).sum():4d}/{m.sum()}")
        else:
            print(f"{name:8s}: accepted={acc:4d} (none overlap GT)")


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--f0", type=int, default=10)
    ap.add_argument("--f1", type=int, default=11)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    a = ap.parse_args()
    main((a.f0, a.f1), (a.height, a.width))

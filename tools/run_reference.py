"""Run the unmodified reference pipeline (/root/reference) on a synthetic
scene — establishes the baseline fps + ATE that bench.py's `vs_baseline` and
ATE bound are measured against (BASELINE.md: the reference publishes no
numbers, so we measure it here).
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_reference(scene, frames, bootstrap=(0, 4), quality=0.03,
                  reproj_err=8.0, max_dist=150, verbose=False):
    sys.path.insert(0, "/root/reference")
    import cv2
    from VisualOdometryPipeLine import VisualOdometryPipeLine  # noqa

    options = {  # reference main.py:20-44 (KITTI preset), quality per arg
        "min_dist_landmarks": 1, "max_dist_landmarks": max_dist,
        "min_baseline_angle": 2, "min_baseline_frames": 2,
        "feature_ratio": 0.8, "feature_max_corners": 1400,
        "feature_quality_level": quality, "feature_min_dist": 10,
        "feature_block_size": 3, "feature_use_harris": False,
        "winSize": (15, 15), "maxLevel": 5,
        "criteria": (cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 50, 0.01),
        "PnP_conf": 0.99, "PnP_error": reproj_err, "PnP_iterations": 500,
    }
    u8 = [np.clip(f, 0, 255).astype(np.uint8) for f in frames]
    vo = VisualOdometryPipeLine(scene.K, options)
    t_boot0 = time.perf_counter()
    vo.initialization(u8[bootstrap[0]], u8[bootstrap[1]])
    boot_s = time.perf_counter() - t_boot0

    positions = []
    frame_ids = []
    t0 = time.perf_counter()
    n = 0
    died_at = None
    for i in range(bootstrap[1] + 1, len(u8)):
        try:
            vo.continuous_operation(u8[i])
        except (ValueError, cv2.error) as e:
            # ValueError: the reference's own fail-stop ("PnP failed" /
            # "Not enough keypoints", VisualOdometryPipeLine.py:352,:358).
            # cv2.error: the same starvation one step earlier — an emptied
            # keypoint table makes calcOpticalFlowPyrLK reject prevPts
            # before the reference's own guard can fire.
            died_at = (i, str(e).strip().split("\n")[-1][:120])
            break
        R_WC, t_WC = vo.transforms[-1]  # (R, t) tuples, world-frame pose
        positions.append(np.asarray(t_WC).reshape(3).copy())
        frame_ids.append(i)
        n += 1
        if verbose:
            print(f"ref frame {i}: pts={vo.num_pts[-1]}")
    dt = time.perf_counter() - t0
    fps = n / dt if n else float("nan")
    return {
        "fps": fps,
        "completed": n,
        "total": len(u8) - bootstrap[1] - 1,
        "died_at": died_at,
        "positions": np.array(positions) if positions else np.zeros((0, 3)),
        "frame_ids": frame_ids,
        "bootstrap_s": boot_s,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=80)
    ap.add_argument("--height", type=int, default=376)
    ap.add_argument("--width", type=int, default=1241)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--quality", type=float, default=0.03)
    ap.add_argument("--stride", type=int, default=4)
    ap.add_argument("--verbose", action="store_true")
    a = ap.parse_args()

    from monocular_visual_odometry_va4mr_tpu.dataio import synthetic
    from monocular_visual_odometry_va4mr_tpu.evalx import ate

    scene = synthetic.make_textured_scene(
        seed=a.seed, num_frames=a.frames, image_shape=(a.height, a.width),
        step=1.0)
    t0 = time.time()
    frames = [scene.render(i) for i in range(a.frames)]
    print(f"rendered {a.frames} frames in {time.time()-t0:.1f}s")

    res = run_reference(scene, frames, bootstrap=(0, a.stride),
                        quality=a.quality, verbose=a.verbose)
    print(f"reference: completed={res['completed']}/{res['total']} "
          f"fps={res['fps']:.2f} died_at={res['died_at']}")
    if res["completed"] >= 8:
        gt = scene.poses_WC[res["frame_ids"], :3, 3]
        rmse = ate.ate_rmse(res["positions"], gt)
        print(f"reference ATE RMSE (Sim3) over completed frames: {rmse:.3f} m")


if __name__ == "__main__":
    main()

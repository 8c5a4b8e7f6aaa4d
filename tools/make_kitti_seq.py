"""Render a reference-scale synthetic sequence to disk in the KITTI layout.

The reference's real workload is 2761 KITTI frames streamed from PNG files
(reference main.py:17, utils.py:16-25).  No real datasets exist in this
container, so this renders the loop-room world (dataio/synthetic.make_loop_scene
-- ~2.9 km of travel with genuine viewpoint revisits for loop closure) or the
weaving corridor at full reference scale and writes <root>/05/image_0/
{i:06d}.png + <root>/poses/05.txt, exactly what dataio/datasets.load_kitti and
the native decoder (native/mvo_io.cpp) consume.

Rendering is ~1.3 s/frame single-core; frames are written atomically and
existing files are skipped, so the render is resumable and parallel across
``--workers`` processes.

Usage:
  python tools/make_kitti_seq.py --out /tmp/kitti_loop_2761 \
      [--frames 2761] [--scene loop|corridor] [--workers 2] [--seed 11]
"""
from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_SCENE = None


def build_scene(args):
    from monocular_visual_odometry_va4mr_tpu.dataio import synthetic

    shape = tuple(int(x) for x in args.shape.split(","))
    if args.scene == "loop":
        return synthetic.make_loop_scene(
            seed=args.seed, num_frames=args.frames, image_shape=shape,
            laps=args.laps, step=args.step)
    return synthetic.make_textured_scene(
        seed=args.seed, num_frames=args.frames, image_shape=shape,
        step=args.step)


def _init_worker(scene, img_dir):
    global _SCENE
    _SCENE = (scene, img_dir)


def _render_one(i):
    import cv2

    scene, img_dir = _SCENE
    path = os.path.join(img_dir, f"{i:06d}.png")
    if os.path.exists(path):
        return 0.0
    t0 = time.perf_counter()
    img = np.clip(scene.render(i), 0, 255).astype(np.uint8)
    tmp = f"{path}.{os.getpid()}.tmp.png"
    assert cv2.imwrite(tmp, img)
    os.replace(tmp, path)
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--frames", type=int, default=2761)
    ap.add_argument("--scene", choices=("loop", "corridor"), default="loop")
    ap.add_argument("--shape", default="376,1241")
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--laps", type=float, default=3.0)
    ap.add_argument("--step", type=float, default=1.0)
    ap.add_argument("--workers", type=int, default=2)
    args = ap.parse_args()

    scene = build_scene(args)
    img_dir = os.path.join(args.out, "05", "image_0")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(os.path.join(args.out, "poses"), exist_ok=True)
    rows = scene.poses_WC[:, :3, :4].reshape(args.frames, 12)
    np.savetxt(os.path.join(args.out, "poses", "05.txt"), rows)
    with open(os.path.join(args.out, "scene.json"), "w") as f:
        json.dump({"scene": args.scene, "frames": args.frames,
                   "shape": list(scene.image_shape), "seed": args.seed,
                   "laps": args.laps, "step": args.step,
                   "K": scene.K.tolist()}, f)

    t0 = time.perf_counter()
    with mp.Pool(args.workers, _init_worker, (scene, img_dir)) as pool:
        done = 0
        for _ in pool.imap_unordered(_render_one, range(args.frames),
                                     chunksize=8):
            done += 1
            if done % 100 == 0:
                dt = time.perf_counter() - t0
                print(f"{done}/{args.frames} frames, {dt:.0f}s elapsed, "
                      f"{dt / done:.2f}s/frame", flush=True)
    print(f"done: {args.frames} frames in {time.perf_counter() - t0:.0f}s")


if __name__ == "__main__":
    main()

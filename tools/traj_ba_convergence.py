"""Iterations-to-convergence vs segment count D for the keyframe-sharded
trajectory BA (parallel/traj_ba.py).

traj_ba is block-Jacobi with a one-segment-per-iteration halo, so
corrections propagate O(D) — this harness RECORDS that constant (round-3
verdict weak #7: the >=75% multi-host efficiency claim needs
iterations-to-convergence growth, not just per-iteration cost).

Convergence criterion: max camera-center error vs ground truth < tol
(absolute, meters), checked after each iteration count.

Usage:  python tools/traj_ba_convergence.py [--tol 0.02] [--max-iters 64]
"""
from __future__ import annotations

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")


def cam_positions(T_CW):
    T_CW = np.asarray(T_CW)
    return np.stack([-T[:3, :3].T @ T[:3, 3] for T in T_CW])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tol", type=float, default=0.02)
    ap.add_argument("--max-iters", type=int, default=64)
    ap.add_argument("--segment-kf", type=int, default=8)
    ap.add_argument("--landmarks", type=int, default=512)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

    from monocular_visual_odometry_va4mr_tpu.parallel import seq_dp, traj_ba

    rows = []
    for D in (1, 2, 4, 8):
        noisy, gt, cam = traj_ba.build_synthetic_traj(
            D, args.segment_kf, args.landmarks, seed=1)
        mesh = seq_dp.make_mesh(D, "kf")
        seg = traj_ba.shard_segments(noisy, mesh, "kf")
        gt_pos = cam_positions(gt.T_CW)
        err0 = np.abs(cam_positions(noisy.T_CW) - gt_pos).max()

        it_needed = None
        err_at = {}
        for iters in range(2, args.max_iters + 1, 2):
            out, costs = traj_ba.run_traj_ba(seg, cam, mesh=mesh, axis="kf",
                                             iters=iters)
            err = float(
                np.abs(cam_positions(out.T_CW) - gt_pos).max())
            err_at[iters] = err
            if err < args.tol:
                it_needed = iters
                break
        rows.append({"D": D, "kf": D * args.segment_kf,
                     "err_init": round(float(err0), 4),
                     "iters_to_tol": it_needed,
                     "err_final": round(err_at[max(err_at)], 4)})
        print(json.dumps(rows[-1]), flush=True)

    its = [r["iters_to_tol"] for r in rows if r["iters_to_tol"]]
    if len(its) == len(rows):
        print(f"# iterations grow ~{its[-1] / max(its[0], 1):.1f}x from D=1 "
              f"to D=8 (block-Jacobi O(D) propagation)")


if __name__ == "__main__":
    main()

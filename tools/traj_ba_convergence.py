"""Iterations-to-convergence vs segment count D for the keyframe-sharded
trajectory BA (parallel/traj_ba.py).

traj_ba is block-Jacobi with a one-segment-per-iteration halo, so
corrections propagate O(D) — this harness RECORDS that constant (round-3
verdict weak #7: the >=75% multi-host efficiency claim needs
iterations-to-convergence growth, not just per-iteration cost).

Convergence metric: a distributed solver's job is to match the CENTRALIZED
solution of the same problem, not to beat the monocular noise floor (which
grows with chain length and would conflate the two).  We solve the identical
problem as ONE global BA window (same observations, block-sparse mask,
anchors frozen) to convergence, then measure the max camera-center distance
between the traj_ba iterate and that reference solution.

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


def global_window(noisy, D, S, L):
    """The SAME problem as one dense-masked global BA window."""
    import jax.numpy as jnp

    from monocular_visual_odometry_va4mr_tpu.backend import ba

    n_poses = 2 + D * S
    uv = np.asarray(noisy.obs_uv)
    m = np.asarray(noisy.obs_mask)
    obs_uv = np.zeros((n_poses, D * L, 2), np.float32)
    obs_mask = np.zeros((n_poses, D * L), bool)
    for d in range(D):
        for r in range(S + 2):
            g = d * S + r  # halo rows r<2 land on the left neighbor's poses
            obs_uv[g, d * L:(d + 1) * L] = uv[d, r]
            obs_mask[g, d * L:(d + 1) * L] = m[d, r]
    return ba.BAWindow(
        T_CW=jnp.concatenate([noisy.anchor_T_CW, noisy.T_CW], axis=0),
        lm_xyz=noisy.lm_xyz,
        obs_uv=jnp.asarray(obs_uv), obs_mask=jnp.asarray(obs_mask))


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

    from monocular_visual_odometry_va4mr_tpu.backend import ba
    from monocular_visual_odometry_va4mr_tpu.core.camera import Camera
    from monocular_visual_odometry_va4mr_tpu.parallel import seq_dp, traj_ba

    S, L = args.segment_kf, args.landmarks
    rows = []
    for D in (1, 2, 4, 8):
        noisy, gt, cam = traj_ba.build_synthetic_traj(D, S, L, seed=1)
        mesh = seq_dp.make_mesh(D, "kf")
        seg = traj_ba.shard_segments(noisy, mesh, "kf")
        gt_pos = cam_positions(gt.T_CW)

        # Centralized reference: the same problem as ONE sparse global
        # window.  Long sparse chains are ill-conditioned for lightly-damped
        # GN (damping 1e-4 diverged at D>=4, cost 3e5 -> 1e8); damping 0.1
        # with 80 iterations converges (measured).
        ref_win, _ = ba.run_ba(global_window(noisy, D, S, L), cam, iters=80,
                               n_fixed=2, damping=0.1)
        ref_pos = cam_positions(ref_win.T_CW)[2:]  # local poses only
        ref_gt_err = float(np.abs(ref_pos - gt_pos).max())

        it_needed, dist_last, gt_err_last = None, None, None
        for iters in range(2, args.max_iters + 1, 2):
            out, _ = traj_ba.run_traj_ba(seg, cam, mesh=mesh, axis="kf",
                                         iters=iters)
            pos = cam_positions(out.T_CW)
            dist_last = float(np.abs(pos - ref_pos).max())
            gt_err_last = float(np.abs(pos - gt_pos).max())
            # Converged when the distributed solution is as good as the
            # centralized one (vs GT) or sits on top of it.
            if dist_last < args.tol or gt_err_last <= 1.1 * ref_gt_err:
                it_needed = iters
                break
        rows.append({"D": D, "kf": D * S,
                     "iters_to_match_global": it_needed,
                     "traj_ba_gt_err": round(gt_err_last, 4),
                     "global_gt_err": round(ref_gt_err, 4),
                     "dist_to_global": round(dist_last, 4)})
        print(json.dumps(rows[-1]), flush=True)

    its = [r["iters_to_match_global"] for r in rows]
    if all(its):
        print(f"# iterations-to-match-global grow {its[0]} -> {its[-1]} "
              f"from D=1 to D=8 (block-Jacobi O(D) propagation)")


if __name__ == "__main__":
    main()

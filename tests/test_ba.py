"""Bundle-adjustment tests: synthetic window with known ground truth;
single-device and sharded paths must agree (SURVEY.md §4 item 4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from monocular_visual_odometry_va4mr_tpu.backend import ba
from monocular_visual_odometry_va4mr_tpu.core.camera import Camera
from monocular_visual_odometry_va4mr_tpu.evalx import ate_rmse
from monocular_visual_odometry_va4mr_tpu.parallel import ba_sharded

K = np.array([[500.0, 0, 320.0], [0, 500.0, 240.0], [0, 0, 1]], np.float32)


def make_ba_problem(rng, W=6, L=256, noise_px=0.3, pose_err=0.02,
                    lm_err=0.15):
    """Ground-truth window + perturbed initial guess."""
    X = np.stack(
        [rng.uniform(-8, 8, L), rng.uniform(-3, 3, L), rng.uniform(10, 40, L)],
        axis=1,
    )
    T_gt = np.zeros((W, 4, 4))
    for i in range(W):
        T = np.eye(4)
        ang = np.array([0.0, np.radians(0.8 * i), 0.0])
        T[:3, :3] = Rotation.from_rotvec(ang).as_matrix()
        T[:3, 3] = -T[:3, :3] @ np.array([0.12 * i, 0.0, 0.4 * i])  # t_CW
        T_gt[i] = T

    obs = np.zeros((W, L, 2), np.float32)
    mask = np.zeros((W, L), bool)
    for i in range(W):
        Xc = X @ T_gt[i][:3, :3].T + T_gt[i][:3, 3]
        z = Xc[:, 2]
        u = K[0, 0] * Xc[:, 0] / z + K[0, 2]
        v = K[1, 1] * Xc[:, 1] / z + K[1, 2]
        ok = (z > 1) & (u > 0) & (u < 640) & (v > 0) & (v < 480)
        obs[i, :, 0] = u + rng.normal(0, noise_px, L)
        obs[i, :, 1] = v + rng.normal(0, noise_px, L)
        mask[i] = ok

    # Perturb all but the first two poses, and all landmarks.
    T_init = T_gt.copy()
    for i in range(2, W):
        d = rng.normal(0, pose_err, 6)
        dT = np.eye(4)
        dT[:3, :3] = Rotation.from_rotvec(d[3:]).as_matrix()
        dT[:3, 3] = d[:3]
        T_init[i] = dT @ T_gt[i]
    X_init = X + rng.normal(0, lm_err, X.shape)

    window = ba.BAWindow(
        T_CW=jnp.asarray(T_init, jnp.float32),
        lm_xyz=jnp.asarray(X_init, jnp.float32),
        obs_uv=jnp.asarray(obs),
        obs_mask=jnp.asarray(mask),
    )
    return window, T_gt, X


def cam_positions(T_CW):
    T_CW = np.asarray(T_CW)
    return np.stack([-T[:3, :3].T @ T[:3, 3] for T in T_CW])


class TestBA:
    def test_nan_garbage_in_invalid_slots_is_harmless(self, rng):
        """Regression for the on-chip NaN poisoning at bench frame 63: the
        slotted state never clears dead rows, so INVALID landmark slots can
        hold Inf/NaN garbage.  backend/ba.py:_residuals_and_jacobians
        hard-zeroes non-finite observations (0 * NaN = NaN would otherwise
        poison the Schur einsum sums); this pins that guard."""
        window, T_gt, X = make_ba_problem(rng)
        L = window.lm_xyz.shape[0]
        dead = np.zeros(L, bool)
        dead[rng.choice(L, size=L // 4, replace=False)] = True
        lm = np.asarray(window.lm_xyz).copy()
        lm[dead] = np.array([np.nan, np.inf, -np.inf])
        obs = np.asarray(window.obs_uv).copy()
        obs[:, dead] = np.nan
        mask = np.asarray(window.obs_mask) & ~dead[None, :]
        poisoned = ba.BAWindow(
            T_CW=window.T_CW,
            lm_xyz=jnp.asarray(lm),
            obs_uv=jnp.asarray(obs),
            obs_mask=jnp.asarray(mask),
        )
        out, costs = ba.run_ba(poisoned, Camera.from_matrix(jnp.asarray(K)),
                               iters=3)
        assert np.all(np.isfinite(np.asarray(out.T_CW)))
        assert np.all(np.isfinite(np.asarray(costs)))
        assert np.all(np.isfinite(np.asarray(out.lm_xyz)[~dead]))
        # Poses must still converge: the masked-clean solve and the poisoned
        # solve see different observation sets (dead rows masked), but both
        # must land near the ground truth.
        err = np.linalg.norm(
            cam_positions(out.T_CW) - cam_positions(T_gt), axis=1)
        assert err.max() < 0.05, err


    def test_cost_decreases_and_poses_recover(self, rng):
        window, T_gt, X_gt = make_ba_problem(rng)
        cam = Camera.from_matrix(K)
        rms0 = float(ba.reprojection_rms(window, cam))
        out, costs = ba.run_ba(window, cam, iters=8)
        rms1 = float(ba.reprojection_rms(out, cam))
        costs = np.asarray(costs)
        assert rms1 < rms0 * 0.2, (rms0, rms1)
        assert rms1 < 1.0  # down to the observation noise level
        assert costs[-1] < costs[0] * 0.1

        est = cam_positions(out.T_CW)
        gt = cam_positions(T_gt)
        assert ate_rmse(est, gt, with_scale=False) < 0.02

    def test_perfect_input_is_stable(self, rng):
        window, T_gt, X_gt = make_ba_problem(rng, noise_px=0.0, pose_err=0.0,
                                             lm_err=0.0)
        cam = Camera.from_matrix(K)
        out, _ = ba.run_ba(window, cam, iters=3)
        np.testing.assert_allclose(np.asarray(out.T_CW), np.asarray(window.T_CW),
                                   atol=1e-3)

    def test_robust_to_outlier_observations(self, rng):
        window, T_gt, X_gt = make_ba_problem(rng)
        # Corrupt 5% of observations badly.
        obs = np.array(window.obs_uv)
        n_bad = obs.shape[1] // 20
        obs[:, :n_bad] += rng.uniform(40, 100, (obs.shape[0], n_bad, 2))
        window = window._replace(obs_uv=jnp.asarray(obs))
        cam = Camera.from_matrix(K)
        out, _ = ba.run_ba(window, cam, iters=8, huber_px=2.0)
        est = cam_positions(out.T_CW)
        gt = cam_positions(T_gt)
        assert ate_rmse(est, gt, with_scale=False) < 0.05


class TestShardedBA:
    def test_matches_single_device(self, rng):
        window, T_gt, X_gt = make_ba_problem(rng, W=5, L=128)
        cam = Camera.from_matrix(K)
        out_ref, costs_ref = ba.run_ba(window, cam, iters=4)

        from monocular_visual_odometry_va4mr_tpu.parallel.seq_dp import make_mesh

        mesh = make_mesh(8, "lm")
        sharded = ba_sharded.shard_window(window, mesh, "lm")
        out_sh, costs_sh = ba_sharded.run_ba_sharded(
            sharded, cam, mesh=mesh, axis="lm", iters=4
        )
        np.testing.assert_allclose(
            np.asarray(costs_sh), np.asarray(costs_ref), rtol=1e-2
        )  # f32 reduction order differs across shards
        np.testing.assert_allclose(
            np.asarray(out_sh.T_CW), np.asarray(out_ref.T_CW), atol=5e-4
        )
        # f32 reduction-order noise compounds over iterations for weakly
        # observed landmarks; poses (the quantity that matters) agree tightly.
        np.testing.assert_allclose(
            np.asarray(out_sh.lm_xyz), np.asarray(out_ref.lm_xyz), atol=0.1
        )

"""Oracle tests for the geometry kernels (polysolve, triangulation,
essential matrix, P3P/PnP) on synthetic scenes with known poses."""
import cv2
import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from monocular_visual_odometry_va4mr_tpu.core.camera import Camera
from monocular_visual_odometry_va4mr_tpu.ops import (
    essential,
    pnp,
    polysolve,
    triangulate,
)

K = np.array([[718.856, 0, 607.1928], [0, 718.856, 185.2157], [0, 0, 1]],
             np.float32)


def make_scene(rng, n=100, noise=0.0):
    """Random points in front of two cameras with known relative pose."""
    X = np.stack(
        [
            rng.uniform(-10, 10, n),
            rng.uniform(-3, 3, n),
            rng.uniform(8, 40, n),
        ],
        axis=1,
    ).astype(np.float64)
    R = Rotation.from_euler("xyz", [2.0, -3.0, 1.0], degrees=True).as_matrix()
    t = np.array([0.6, -0.1, 0.8])  # cam1 = R @ X + t (world == cam0)
    uv0, _ = cv2.projectPoints(X, np.zeros(3), np.zeros(3), K.astype(np.float64),
                               np.zeros(4))
    rvec, _ = cv2.Rodrigues(R)
    uv1, _ = cv2.projectPoints(X, rvec, t, K.astype(np.float64), np.zeros(4))
    uv0 = uv0.squeeze(1) + rng.normal(0, noise, (n, 2))
    uv1 = uv1.squeeze(1) + rng.normal(0, noise, (n, 2))
    return X, R, t, uv0.astype(np.float32), uv1.astype(np.float32)


class TestPolysolve:
    def test_cubic_real_root(self, rng):
        for _ in range(50):
            roots = rng.uniform(-5, 5, 3)
            # (t-r0)(t-r1)(t-r2) = t^3 - (sum) t^2 + ...
            a2 = -roots.sum()
            a1 = roots[0] * roots[1] + roots[0] * roots[2] + roots[1] * roots[2]
            a0 = -roots.prod()
            r = float(polysolve.cubic_real_root(jnp.float32(a2), jnp.float32(a1),
                                                jnp.float32(a0)))
            # Must be close to one of the true roots.
            assert np.min(np.abs(roots - r)) < 1e-2, (roots, r)

    def test_quartic_all_real(self, rng):
        for _ in range(50):
            true = np.sort(rng.uniform(-3, 3, 4))
            c = np.poly(true)  # [1, a3, a2, a1, a0]
            roots, is_real = polysolve.quartic_roots(
                jnp.float32(c[1]), jnp.float32(c[2]), jnp.float32(c[3]),
                jnp.float32(c[4])
            )
            roots = np.sort(np.asarray(roots)[np.asarray(is_real)])
            assert len(roots) == 4
            np.testing.assert_allclose(roots, true, atol=5e-2)

    def test_quartic_two_real(self, rng):
        # (x^2+1)(x-a)(x-b): two real roots.
        for _ in range(20):
            a, b = rng.uniform(-2, 2, 2)
            c = np.polymul(np.polymul([1.0, 0.0, 1.0], [1.0, -a]), [1.0, -b])
            roots, is_real = polysolve.quartic_roots(
                jnp.float32(c[1]), jnp.float32(c[2]), jnp.float32(c[3]),
                jnp.float32(c[4])
            )
            real = np.sort(np.asarray(roots)[np.asarray(is_real)])
            np.testing.assert_allclose(real, np.sort([a, b]), atol=5e-2)


class TestTriangulate:
    def test_matches_cv2(self, rng):
        X, R, t, uv0, uv1 = make_scene(rng, 50)
        P0 = K @ np.eye(3, 4)
        P1 = K @ np.hstack([R, t.reshape(3, 1)])
        X_cv = cv2.triangulatePoints(P0.astype(np.float64), P1.astype(np.float64),
                                     uv0.T.astype(np.float64),
                                     uv1.T.astype(np.float64))
        X_cv = (X_cv[:3] / X_cv[3]).T
        X_ours = np.asarray(
            triangulate.triangulate_dlt(
                jnp.broadcast_to(jnp.asarray(P0, jnp.float32), (50, 3, 4)),
                jnp.broadcast_to(jnp.asarray(P1, jnp.float32), (50, 3, 4)),
                jnp.asarray(uv0),
                jnp.asarray(uv1),
            )
        )
        np.testing.assert_allclose(X_ours, X_cv, atol=1e-2, rtol=1e-3)
        np.testing.assert_allclose(X_ours, X, atol=1e-2, rtol=1e-3)

    def test_bearing_angle(self):
        cam = Camera.from_matrix(K)
        # Same pixel, rotated camera: ray angle equals rotation angle.
        uv = jnp.asarray([[607.1928, 185.2157]])  # principal point -> optical axis
        R0 = jnp.eye(3)
        R1 = jnp.asarray(
            Rotation.from_euler("y", 5.0, degrees=True).as_matrix(), jnp.float32
        )
        ang = float(
            triangulate.bearing_angle_deg(cam, uv, uv, R0[None], R1)[0]
        )
        assert abs(ang - 5.0) < 0.05

    def test_candidate_promotion(self, rng):
        X, R, t, uv0, uv1 = make_scene(rng, 64)
        cam = Camera.from_matrix(K)
        T0 = np.eye(4, dtype=np.float32)
        T1 = np.eye(4, dtype=np.float32)
        T1[:3, :3] = R
        T1[:3, 3] = t
        Xt, promote, keep = triangulate.triangulate_candidates(
            cam,
            jnp.asarray(uv0),
            jnp.asarray(uv1),
            jnp.broadcast_to(jnp.asarray(T0), (64, 4, 4)),
            jnp.asarray(T1),
            jnp.ones(64, bool),
            jnp.full((64,), 5, jnp.int32),
            min_baseline_frames=2,
            min_baseline_angle_deg=0.5,
            min_dist=1.0,
            max_dist=150.0,
        )
        promote = np.asarray(promote)
        assert promote.sum() > 50  # plenty of baseline in this scene
        np.testing.assert_allclose(np.asarray(Xt)[promote], X[promote], atol=0.05)
        assert not np.any(promote & np.asarray(keep))


class TestEssential:
    def test_clean_correspondences(self, rng):
        X, R, t, uv0, uv1 = make_scene(rng, 200, noise=0.0)
        cam = Camera.from_matrix(K)
        E, inl, ok = essential.find_essential_ransac(
            jax.random.PRNGKey(0), cam, jnp.asarray(uv0), jnp.asarray(uv1),
            jnp.ones(200, bool), iterations=200, threshold_px=1.0,
        )
        assert bool(ok)
        assert np.asarray(inl).sum() > 190
        # E should satisfy the epipolar constraint for the true geometry:
        # E ~ [t]x R (up to scale).
        E_true = np.cross(np.eye(3), t) @ R  # hat(t) @ R
        E_np = np.array(E)
        E_np /= np.linalg.norm(E_np)
        E_true /= np.linalg.norm(E_true)
        if np.sum(E_np * E_true) < 0:
            E_true = -E_true
        np.testing.assert_allclose(E_np, E_true, atol=1e-3)

    def test_with_outliers(self, rng):
        X, R, t, uv0, uv1 = make_scene(rng, 300, noise=0.3)
        n_out = 60
        uv1[:n_out] = rng.uniform(0, 300, (n_out, 2))  # corrupt 20%
        cam = Camera.from_matrix(K)
        E, inl, ok = essential.find_essential_ransac(
            jax.random.PRNGKey(1), cam, jnp.asarray(uv0), jnp.asarray(uv1),
            jnp.ones(300, bool), iterations=500, threshold_px=1.5,
        )
        inl = np.asarray(inl)
        assert bool(ok)
        assert inl[n_out:].sum() > 200  # most true matches kept
        assert inl[:n_out].sum() < 10  # outliers rejected

    def test_recover_pose_matches_truth(self, rng):
        X, R, t, uv0, uv1 = make_scene(rng, 200)
        cam = Camera.from_matrix(K)
        E_true = np.cross(np.eye(3), t / np.linalg.norm(t)) @ R
        R_rec, t_rec, votes = essential.recover_pose(
            jnp.asarray(E_true, jnp.float32), cam, jnp.asarray(uv0),
            jnp.asarray(uv1), jnp.ones(200, bool),
        )
        np.testing.assert_allclose(np.asarray(R_rec), R, atol=1e-3)
        t_unit = t / np.linalg.norm(t)
        np.testing.assert_allclose(np.asarray(t_rec), t_unit, atol=1e-3)
        assert int(votes) > 150


class TestPnP:
    def test_p3p_exact(self, rng):
        X, R, t, uv0, uv1 = make_scene(rng, 3)
        cam = Camera.from_matrix(K)
        rays = cam.backproject(jnp.asarray(uv1))
        rays = rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)
        Ts, oks = pnp._p3p_grunert(jnp.asarray(X, jnp.float32), rays)
        Ts, oks = np.asarray(Ts), np.asarray(oks)
        assert oks.any()
        # One of the solutions must match the true pose.
        errs = []
        for T, ok in zip(Ts, oks):
            if not ok:
                continue
            errs.append(
                np.linalg.norm(T[:3, :3] - R) + np.linalg.norm(T[:3, 3] - t)
            )
        assert min(errs) < 1e-2, errs

    def test_ransac_with_outliers_matches_cv2(self, rng):
        X, R, t, uv0, uv1 = make_scene(rng, 256, noise=0.5)
        n_out = 50
        uv1[:n_out] += rng.uniform(30, 80, (n_out, 2))
        cam = Camera.from_matrix(K)
        T, inl, ok = pnp.solve_pnp_ransac(
            jax.random.PRNGKey(2), cam, jnp.asarray(X, jnp.float32),
            jnp.asarray(uv1), jnp.ones(256, bool), iterations=300,
            reproj_threshold_px=8.0,
        )
        assert bool(ok)
        T = np.asarray(T)
        # Rotation within 0.2 deg, translation within 5 cm of truth.
        dR = Rotation.from_matrix(T[:3, :3] @ R.T).magnitude() * 180 / np.pi
        assert dR < 0.2, dR
        assert np.linalg.norm(T[:3, 3] - t) < 0.05
        assert np.asarray(inl)[n_out:].sum() > 180

        # Against cv2 on the same data:
        succ, rvec, tvec, inl_cv = cv2.solvePnPRansac(
            X.astype(np.float32), uv1.reshape(-1, 1, 2), K, np.zeros(4),
            flags=cv2.SOLVEPNP_P3P, confidence=0.99, reprojectionError=8.0,
            iterationsCount=500,
        )
        R_cv, _ = cv2.Rodrigues(rvec)
        dR_cv = Rotation.from_matrix(T[:3, :3] @ R_cv.T).magnitude() * 180 / np.pi
        assert dR_cv < 0.3
        assert np.linalg.norm(T[:3, 3] - tvec.ravel()) < 0.1

    def test_refine_improves(self, rng):
        X, R, t, uv0, uv1 = make_scene(rng, 128, noise=1.0)
        cam = Camera.from_matrix(K)
        T0 = np.eye(4, dtype=np.float32)
        T0[:3, :3] = Rotation.from_euler("xyz", [2.5, -2.0, 1.5],
                                         degrees=True).as_matrix() @ R
        T0[:3, 3] = t + [0.3, -0.2, 0.4]
        before = np.asarray(pnp.reprojection_errors(
            jnp.asarray(T0), cam, jnp.asarray(X, jnp.float32), jnp.asarray(uv1)))
        T1 = pnp.refine_pose_gn(
            jnp.asarray(T0), cam, jnp.asarray(X, jnp.float32), jnp.asarray(uv1),
            jnp.ones(128), iters=10,
        )
        after = np.asarray(pnp.reprojection_errors(
            T1, cam, jnp.asarray(X, jnp.float32), jnp.asarray(uv1)))
        assert np.median(after) < np.median(before) * 0.1
        assert np.median(after) < 2.0

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


def make_planar_scene(rng, n=100, noise=0.0):
    """All points on one plane — the 8-point algorithm's degenerate case
    (cv2.findEssentialMat's 5-point handles it, reference
    VisualOdometryPipeLine.py:308)."""
    gx = rng.uniform(-12, 12, n)
    gy = rng.uniform(-4, 4, n)
    X = np.stack([gx, gy, 20.0 + 0.25 * gx + 0.1 * gy], axis=1)
    R = Rotation.from_euler("xyz", [1.0, -4.0, 0.5], degrees=True).as_matrix()
    t = np.array([0.8, 0.05, 0.6])
    uv0, _ = cv2.projectPoints(X, np.zeros(3), np.zeros(3),
                               K.astype(np.float64), np.zeros(4))
    rvec, _ = cv2.Rodrigues(R)
    uv1, _ = cv2.projectPoints(X, rvec, t, K.astype(np.float64), np.zeros(4))
    uv0 = uv0.squeeze(1) + rng.normal(0, noise, (n, 2))
    uv1 = uv1.squeeze(1) + rng.normal(0, noise, (n, 2))
    return X, R, t, uv0.astype(np.float32), uv1.astype(np.float32)


class TestFivePoint:
    """Oracle tests for the Nistér 5-point minimal solver
    (ops/essential5.py; the solver cv2.findEssentialMat runs internally)."""

    def _normalize(self, uv):
        Kinv = np.linalg.inv(K.astype(np.float64))
        h = np.concatenate([uv, np.ones((len(uv), 1))], axis=1)
        x = h @ Kinv.T
        return (x[:, :2] / x[:, 2:3]).astype(np.float32)

    def test_exact_minimal_sample(self, rng):
        from monocular_visual_odometry_va4mr_tpu.ops import essential5

        bests = []
        for trial in range(8):
            X, R, t, uv0, uv1 = make_scene(rng, 40, noise=0.0)
            x0 = self._normalize(uv0)
            x1 = self._normalize(uv1)
            Es, valid = essential5.five_point_essentials(
                jnp.asarray(x0[:5]), jnp.asarray(x1[:5]))
            Es = np.asarray(Es)
            valid = np.asarray(valid)
            assert valid.any()
            E_true = np.cross(np.eye(3), t / np.linalg.norm(t)) @ R
            E_true /= np.linalg.norm(E_true)
            # At least one of the (up to) 10 solutions must match the true
            # geometry AND satisfy the epipolar constraint on held-out points.
            h0 = np.concatenate([x0, np.ones((40, 1))], 1)
            h1 = np.concatenate([x1, np.ones((40, 1))], 1)
            best = np.inf
            for E, v in zip(Es, valid):
                if not v:
                    continue
                En = E / np.linalg.norm(E)
                if np.sum(En * E_true) < 0:
                    En = -En
                resid = np.abs(np.einsum("ni,ij,nj->n", h1, En, h0))
                best = min(best, max(np.abs(En - E_true).max(),
                                     resid[5:].max()))
            bests.append(best)
        bests = np.sort(bests)
        # f32 minimal solvers have occasional ill-conditioned samples — a
        # near-degenerate 5-tuple genuinely under-determines E, and RANSAC's
        # inlier scoring is what rejects those hypotheses.  Require most
        # samples tight rather than all.
        assert bests[5] < 5e-3, bests  # >= 6 of 8 within 5e-3
        assert bests[6] < 5e-2, bests  # >= 7 of 8 reasonable

    def test_essential_properties(self, rng):
        from monocular_visual_odometry_va4mr_tpu.ops import essential5

        X, R, t, uv0, uv1 = make_scene(rng, 5, noise=0.0)
        x0 = self._normalize(uv0)
        x1 = self._normalize(uv1)
        Es, valid = essential5.five_point_essentials(
            jnp.asarray(x0), jnp.asarray(x1))
        h0 = np.concatenate([x0, np.ones((5, 1))], 1)
        h1 = np.concatenate([x1, np.ones((5, 1))], 1)
        n_checked = 0
        for E, v in zip(np.asarray(Es), np.asarray(valid)):
            if not v:
                continue
            n_checked += 1
            # Every returned E: unit norm, rank 2, singular values (s, s, 0),
            # epipolar constraint on the defining 5 points.
            s = np.linalg.svd(E, compute_uv=False)
            assert s[2] < 5e-3, s
            np.testing.assert_allclose(s[0], s[1], atol=5e-3)
            resid = np.abs(np.einsum("ni,ij,nj->n", h1, E, h0))
            assert resid.max() < 2e-4, resid
        assert n_checked >= 1

    def test_planar_scene_ransac(self, rng):
        """On a planar scene the 5-point RANSAC must recover the true pose;
        cross-checked against the cv2.findEssentialMat oracle."""
        X, R, t, uv0, uv1 = make_planar_scene(rng, 150, noise=0.0)
        cam = Camera.from_matrix(K)
        E, inl, ok = essential.find_essential_ransac(
            jax.random.PRNGKey(2), cam, jnp.asarray(uv0), jnp.asarray(uv1),
            jnp.ones(150, bool), iterations=300, threshold_px=1.0,
            solver="5point",
        )
        assert bool(ok)
        assert np.asarray(inl).sum() > 130
        R_rec, t_rec, votes = essential.recover_pose(
            E, cam, jnp.asarray(uv0), jnp.asarray(uv1), inl)
        t_unit = t / np.linalg.norm(t)
        np.testing.assert_allclose(np.asarray(R_rec), R, atol=5e-3)
        np.testing.assert_allclose(np.asarray(t_rec), t_unit, atol=5e-3)
        # cv2 cross-check: planar scenes carry a two-fold E ambiguity, and
        # cv2.findEssentialMat can return either member (its Sampson scoring
        # cannot separate them; on this scene it picks the conjugate).  Our
        # RANSAC breaks the tie by cheirality votes, so assert only that the
        # cv2 solution explains the data, not that the poses agree.
        E_cv, _ = cv2.findEssentialMat(uv0, uv1, K.astype(np.float64),
                                       method=cv2.RANSAC, prob=0.99,
                                       threshold=1.0)
        F_cv = np.linalg.inv(K.astype(np.float64)).T @ E_cv @ np.linalg.inv(
            K.astype(np.float64))
        d2 = np.asarray(essential.sampson_distance_sq(
            jnp.asarray(F_cv, jnp.float32), jnp.asarray(uv0),
            jnp.asarray(uv1)))
        assert (d2 < 1.0).sum() > 130

    def test_planar_beats_8point(self, rng):
        """Same planar scene: document WHY 5-point is the default — 8-point's
        hypothesis bank is rank-deficient on planar data, so its recovered
        rotation is (much) worse."""
        X, R, t, uv0, uv1 = make_planar_scene(rng, 150, noise=0.05)
        cam = Camera.from_matrix(K)
        errs = {}
        for solver in ("5point", "8point"):
            E, inl, ok = essential.find_essential_ransac(
                jax.random.PRNGKey(3), cam, jnp.asarray(uv0),
                jnp.asarray(uv1), jnp.ones(150, bool), iterations=300,
                threshold_px=1.0, solver=solver,
            )
            R_rec, t_rec, _ = essential.recover_pose(
                E, cam, jnp.asarray(uv0), jnp.asarray(uv1), inl)
            errs[solver] = np.abs(np.asarray(R_rec) - R).max()
        assert errs["5point"] < 5e-3, errs
        assert errs["5point"] <= errs["8point"], errs


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

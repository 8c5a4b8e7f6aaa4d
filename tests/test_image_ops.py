"""Oracle tests for dense image ops, corner detection and KLT vs OpenCV."""
import cv2
import jax.numpy as jnp
import numpy as np

from monocular_visual_odometry_va4mr_tpu.ops import corners, image as imops, klt


def synthetic_texture(rng, H=240, W=320, blur=3):
    """Smooth random texture with enough gradient for tracking."""
    img = rng.uniform(0, 255, size=(H, W)).astype(np.float32)
    img = cv2.GaussianBlur(img, (0, 0), blur)
    img = (img - img.min()) / (img.max() - img.min()) * 255.0
    return img.astype(np.float32)


class TestDenseOps:
    def test_gaussian_blur_matches_cv2(self, rng):
        img = rng.uniform(0, 255, (64, 80)).astype(np.float32)
        ours = np.asarray(imops.gaussian_blur(jnp.asarray(img), 1.5))
        theirs = cv2.GaussianBlur(img, (0, 0), 1.5)
        # Compare interiors (border handling differs).
        np.testing.assert_allclose(ours[8:-8, 8:-8], theirs[8:-8, 8:-8], atol=0.1)

    def test_sobel_matches_cv2(self, rng):
        img = rng.uniform(0, 255, (64, 80)).astype(np.float32)
        gx, gy = imops.sobel_gradients(jnp.asarray(img))
        gx_cv = cv2.Sobel(img, cv2.CV_32F, 1, 0, ksize=3)
        gy_cv = cv2.Sobel(img, cv2.CV_32F, 0, 1, ksize=3)
        np.testing.assert_allclose(np.asarray(gx)[2:-2, 2:-2], gx_cv[2:-2, 2:-2], atol=1e-2)
        np.testing.assert_allclose(np.asarray(gy)[2:-2, 2:-2], gy_cv[2:-2, 2:-2], atol=1e-2)

    def test_pyr_down_matches_cv2(self, rng):
        img = rng.uniform(0, 255, (64, 80)).astype(np.float32)
        ours = np.asarray(imops.pyr_down(jnp.asarray(img)))
        theirs = cv2.pyrDown(img)
        np.testing.assert_allclose(ours[2:-2, 2:-2], theirs[2:-2, 2:-2], atol=0.5)

    def test_bilinear_sample(self, rng):
        img = rng.uniform(0, 255, (32, 32)).astype(np.float32)
        # Integer coords return exact pixels.
        uv = jnp.asarray([[3.0, 5.0], [10.0, 20.0]])
        vals = np.asarray(imops.bilinear_sample(jnp.asarray(img), uv))
        assert vals[0] == img[5, 3]
        assert vals[1] == img[20, 10]
        # Interpolation bounded by neighbors.
        uv = jnp.asarray([[3.5, 5.5]])
        v = float(imops.bilinear_sample(jnp.asarray(img), uv)[0])
        patch = img[5:7, 3:5]
        assert patch.min() - 1e-3 <= v <= patch.max() + 1e-3


class TestCorners:
    def test_finds_checkerboard_corners(self):
        img = np.zeros((200, 200), np.float32)
        for i in range(0, 200, 40):
            for j in range(0, 200, 40):
                if (i // 40 + j // 40) % 2 == 0:
                    img[i : i + 40, j : j + 40] = 255.0
        uv, score, valid = corners.detect_corners(
            jnp.asarray(img), max_corners=100, quality_level=0.1, cell=10
        )
        uv = np.asarray(uv)[np.asarray(valid)]
        # Interior checkerboard crossings at multiples of 40.
        expected = [(x, y) for x in range(40, 200, 40) for y in range(40, 200, 40)]
        hits = 0
        for ex, ey in expected:
            if np.any(np.linalg.norm(uv - np.array([ex, ey]), axis=1) < 3.0):
                hits += 1
        assert hits >= len(expected) * 0.9

    def test_overlaps_cv2_on_texture(self, rng):
        img = synthetic_texture(rng, 240, 320, blur=2)
        uv, _, valid = corners.detect_corners(
            jnp.asarray(img), max_corners=200, quality_level=0.1, cell=10
        )
        ours = np.asarray(uv)[np.asarray(valid)]
        cv_pts = cv2.goodFeaturesToTrack(
            img.astype(np.uint8), maxCorners=200, qualityLevel=0.1, minDistance=10,
            blockSize=3,
        ).squeeze(1)
        # Most cv2 corners should have one of ours nearby (grid NMS reshuffles
        # weak ones, strong corners agree).
        close = 0
        for p in cv_pts:
            if np.min(np.linalg.norm(ours - p, axis=1)) < 5.0:
                close += 1
        assert close / len(cv_pts) > 0.6, f"only {close}/{len(cv_pts)} matched"

    def test_static_shapes(self, rng):
        img = synthetic_texture(rng, 120, 160)
        uv, score, valid = corners.detect_corners(jnp.asarray(img), max_corners=1400)
        assert uv.shape == (1400, 2)
        assert valid.shape == (1400,)


class TestKLT:
    def test_pure_translation(self, rng):
        img0 = synthetic_texture(rng, 240, 320, blur=2)
        dx, dy = 3.7, -2.3
        M = np.float32([[1, 0, dx], [0, 1, dy]])
        img1 = cv2.warpAffine(img0, M, (320, 240))

        pts = rng.uniform(40, 180, size=(64, 2)).astype(np.float32)
        pts[:, 0] = rng.uniform(40, 280, size=64)

        pyr0 = imops.build_pyramid(jnp.asarray(img0), 3)
        pyr1 = imops.build_pyramid(jnp.asarray(img1), 3)
        new_pts, ok, resid = klt.track_features(
            pyr0, pyr1, jnp.asarray(pts), jnp.ones(64, bool), window=15, num_iters=30
        )
        new_pts = np.asarray(new_pts)
        ok = np.asarray(ok)
        assert ok.sum() > 50
        flow = new_pts[ok] - pts[ok]
        err = np.linalg.norm(flow - np.array([dx, dy]), axis=1)
        assert np.median(err) < 0.1, f"median err {np.median(err)}"

    def test_matches_cv2_on_warp(self, rng):
        img0 = synthetic_texture(rng, 240, 320, blur=2)
        # Small rotation + translation warp.
        M = cv2.getRotationMatrix2D((160, 120), 1.5, 1.0)
        M[:, 2] += [2.0, -1.5]
        img1 = cv2.warpAffine(img0, M, (320, 240))

        cv_pts = cv2.goodFeaturesToTrack(
            img0.astype(np.uint8), maxCorners=80, qualityLevel=0.05, minDistance=12
        ).squeeze(1)

        cv_next, cv_status, _ = cv2.calcOpticalFlowPyrLK(
            img0.astype(np.uint8), img1.astype(np.uint8), cv_pts.reshape(-1, 1, 2),
            None, winSize=(15, 15), maxLevel=3,
            criteria=(cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 50, 0.01),
        )
        cv_next = cv_next.squeeze(1)
        cv_status = cv_status.squeeze(1).astype(bool)

        pyr0 = imops.build_pyramid(jnp.asarray(img0), 4)
        pyr1 = imops.build_pyramid(jnp.asarray(img1), 4)
        our_next, our_ok, _ = klt.track_features(
            pyr0, pyr1, jnp.asarray(cv_pts), jnp.ones(len(cv_pts), bool),
            window=15, num_iters=30,
        )
        our_next = np.asarray(our_next)
        our_ok = np.asarray(our_ok)

        both = cv_status & our_ok
        assert both.sum() > 0.7 * len(cv_pts)
        err = np.linalg.norm(our_next[both] - cv_next[both], axis=1)
        assert np.median(err) < 0.25, f"median disagreement {np.median(err)}"

    def test_invalid_slots_stay_invalid(self, rng):
        img0 = synthetic_texture(rng, 120, 160)
        pyr = imops.build_pyramid(jnp.asarray(img0), 2)
        pts = jnp.zeros((8, 2)) + 50.0
        valid = jnp.zeros(8, bool).at[0].set(True)
        _, ok, _ = klt.track_features(pyr, pyr, pts, valid, window=15)
        assert np.asarray(ok).sum() == 1


class TestKLTPallas:
    """Interpret-mode checks of the Pallas tracker (compiled path is TPU-only;
    it is exercised by bench.py and agreed with cv2 to 0.011px median)."""

    def test_pure_translation_interpret(self, rng):
        from monocular_visual_odometry_va4mr_tpu.ops import klt_pallas

        img0 = synthetic_texture(rng, 240, 320, blur=2)
        dx, dy = 3.7, -2.3
        M = np.float32([[1, 0, dx], [0, 1, dy]])
        img1 = cv2.warpAffine(img0, M, (320, 240))
        pts = np.stack(
            [rng.uniform(30, 290, 64), rng.uniform(30, 210, 64)], 1
        ).astype(np.float32)
        pyr0 = imops.build_pyramid(jnp.asarray(img0), 5)
        pyr1 = imops.build_pyramid(jnp.asarray(img1), 5)
        new_pts, ok, _ = klt_pallas.track_features_pallas(
            pyr0, pyr1, jnp.asarray(pts), jnp.ones(64, bool), num_iters=10,
            interpret=True,
        )
        new_pts, ok = np.asarray(new_pts), np.asarray(ok)
        assert ok.sum() > 45
        err = np.linalg.norm(new_pts[ok] - pts[ok] - [dx, dy], axis=1)
        assert np.median(err) < 0.1

    def test_large_motion_via_coarse_prior(self, rng):
        from monocular_visual_odometry_va4mr_tpu.ops import klt_pallas

        img0 = synthetic_texture(rng, 240, 320, blur=2)
        dx, dy = 37.0, 11.0  # far beyond the LK window alone
        M = np.float32([[1, 0, dx], [0, 1, dy]])
        img1 = cv2.warpAffine(img0, M, (320, 240))
        pts = np.stack(
            [rng.uniform(20, 260, 64), rng.uniform(20, 200, 64)], 1
        ).astype(np.float32)
        pyr0 = imops.build_pyramid(jnp.asarray(img0), 5)
        pyr1 = imops.build_pyramid(jnp.asarray(img1), 5)
        new_pts, ok, _ = klt_pallas.track_features_pallas(
            pyr0, pyr1, jnp.asarray(pts), jnp.ones(64, bool), num_iters=10,
            interpret=True,
        )
        new_pts, ok = np.asarray(new_pts), np.asarray(ok)
        assert ok.sum() > 30
        err = np.linalg.norm(new_pts[ok] - pts[ok] - [dx, dy], axis=1)
        assert np.median(err) < 0.2

    def test_invalid_slots_stay_invalid(self, rng):
        from monocular_visual_odometry_va4mr_tpu.ops import klt_pallas

        img0 = synthetic_texture(rng, 120, 160)
        pyr = imops.build_pyramid(jnp.asarray(img0), 4)
        pts = jnp.zeros((8, 2)) + 50.0
        valid = jnp.zeros(8, bool).at[0].set(True)
        _, ok, _ = klt_pallas.track_features_pallas(
            pyr, pyr, pts, valid, num_iters=5, interpret=True
        )
        assert np.asarray(ok).sum() <= 1
        assert not np.asarray(ok)[1:].any()


class TestKLTPallas2:
    """Interpret-mode checks of the packed-batch Pallas tracker (v2).

    The compiled path is TPU-only; on hardware v2 agreed with v1 bit-for-bit
    on ok-masks and to <0.01px on positions while running ~7x faster."""

    def test_pure_translation_interpret(self, rng):
        from monocular_visual_odometry_va4mr_tpu.ops import klt_pallas2

        img0 = synthetic_texture(rng, 240, 320, blur=2)
        dx, dy = 3.7, -2.3
        M = np.float32([[1, 0, dx], [0, 1, dy]])
        img1 = cv2.warpAffine(img0, M, (320, 240))
        pts = np.stack(
            [rng.uniform(30, 290, 64), rng.uniform(30, 210, 64)], 1
        ).astype(np.float32)
        pyr0 = imops.build_pyramid(jnp.asarray(img0), 5)
        pyr1 = imops.build_pyramid(jnp.asarray(img1), 5)
        new_pts, ok, _ = klt_pallas2.track_features_pallas2(
            pyr0, pyr1, jnp.asarray(pts), jnp.ones(64, bool), num_iters=8,
            interpret=True,
        )
        new_pts, ok = np.asarray(new_pts), np.asarray(ok)
        assert ok.sum() > 45
        err = np.linalg.norm(new_pts[ok] - pts[ok] - [dx, dy], axis=1)
        assert np.median(err) < 0.1

    def test_large_motion_via_coarse_prior(self, rng):
        from monocular_visual_odometry_va4mr_tpu.ops import klt_pallas2

        img0 = synthetic_texture(rng, 240, 320, blur=2)
        dx, dy = 37.0, 11.0  # far beyond the LK window alone
        M = np.float32([[1, 0, dx], [0, 1, dy]])
        img1 = cv2.warpAffine(img0, M, (320, 240))
        pts = np.stack(
            [rng.uniform(20, 260, 64), rng.uniform(20, 200, 64)], 1
        ).astype(np.float32)
        pyr0 = imops.build_pyramid(jnp.asarray(img0), 5)
        pyr1 = imops.build_pyramid(jnp.asarray(img1), 5)
        new_pts, ok, _ = klt_pallas2.track_features_pallas2(
            pyr0, pyr1, jnp.asarray(pts), jnp.ones(64, bool), num_iters=8,
            interpret=True,
        )
        new_pts, ok = np.asarray(new_pts), np.asarray(ok)
        assert ok.sum() > 30
        err = np.linalg.norm(new_pts[ok] - pts[ok] - [dx, dy], axis=1)
        assert np.median(err) < 0.2

    def test_matches_v1_tracker(self, rng):
        """v1 and v2 implement the same algorithm over the same coarse prior;
        their accepted tracks must agree to sub-pixel tolerance."""
        from monocular_visual_odometry_va4mr_tpu.ops import (klt_pallas,
                                                             klt_pallas2)

        img0 = synthetic_texture(rng, 240, 320, blur=2)
        M = np.float32([[1, 0, 2.6], [0, 1, -1.2]])
        img1 = cv2.warpAffine(img0, M, (320, 240))
        pts = np.stack(
            [rng.uniform(30, 290, 128), rng.uniform(30, 210, 128)], 1
        ).astype(np.float32)
        pyr0 = imops.build_pyramid(jnp.asarray(img0), 5)
        pyr1 = imops.build_pyramid(jnp.asarray(img1), 5)
        p1, ok1, _ = klt_pallas.track_features_pallas(
            pyr0, pyr1, jnp.asarray(pts), jnp.ones(128, bool), num_iters=8,
            interpret=True)
        p2, ok2, _ = klt_pallas2.track_features_pallas2(
            pyr0, pyr1, jnp.asarray(pts), jnp.ones(128, bool), num_iters=8,
            interpret=True)
        p1, ok1, p2, ok2 = map(np.asarray, (p1, ok1, p2, ok2))
        both = ok1 & ok2
        assert both.sum() > 0.8 * max(ok1.sum(), ok2.sum())
        assert np.median(np.linalg.norm(p1[both] - p2[both], axis=1)) < 0.05

    def test_invalid_slots_stay_invalid(self, rng):
        from monocular_visual_odometry_va4mr_tpu.ops import klt_pallas2

        img0 = synthetic_texture(rng, 120, 160)
        pyr = imops.build_pyramid(jnp.asarray(img0), 4)
        pts = jnp.zeros((8, 2)) + 50.0
        valid = jnp.zeros(8, bool).at[0].set(True)
        _, ok, _ = klt_pallas2.track_features_pallas2(
            pyr, pyr, pts, valid, num_iters=5, interpret=True
        )
        assert np.asarray(ok).sum() <= 1
        assert not np.asarray(ok)[1:].any()

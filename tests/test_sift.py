"""SIFT + matcher quality tests: judged on match correctness under a known
warp (bootstrap-grade quality), not bit parity with cv2 (SURVEY.md N1)."""
import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from monocular_visual_odometry_va4mr_tpu.ops import match, sift


def textured_image(rng, H=240, W=320):
    img = rng.uniform(0, 255, (H, W)).astype(np.float32)
    img = cv2.GaussianBlur(img, (0, 0), 1.5)
    img = (img - img.min()) / (img.max() - img.min()) * 255
    return img.astype(np.float32)


@pytest.fixture(scope="module")
def pair():
    rng = np.random.default_rng(5)
    img0 = textured_image(rng)
    M = cv2.getRotationMatrix2D((160, 120), 8.0, 1.0)
    M[:, 2] += [5.0, -3.0]
    img1 = cv2.warpAffine(img0, M, (320, 240))
    return img0, img1, M


class TestSift:
    def test_detect_finds_repeatable_keypoints(self, pair):
        img0, img1, M = pair
        f0 = sift.detect_and_compute(jnp.asarray(img0), max_features=512)
        f1 = sift.detect_and_compute(jnp.asarray(img1), max_features=512)
        uv0 = np.asarray(f0.uv)[np.asarray(f0.valid)]
        uv1 = np.asarray(f1.uv)[np.asarray(f1.valid)]
        assert len(uv0) > 100 and len(uv1) > 100

        # Repeatability: warped kp0 should have a kp1 nearby.
        warped = uv0 @ M[:, :2].T + M[:, 2]
        inb = (
            (warped[:, 0] > 10) & (warped[:, 0] < 310)
            & (warped[:, 1] > 10) & (warped[:, 1] < 230)
        )
        d = np.linalg.norm(warped[inb][:, None] - uv1[None], axis=2).min(1)
        assert (d < 2.0).mean() > 0.5, f"repeatability {(d < 2.0).mean():.2f}"

    def test_match_under_warp(self, pair):
        img0, img1, M = pair
        f0 = sift.detect_and_compute(jnp.asarray(img0), max_features=512)
        f1 = sift.detect_and_compute(jnp.asarray(img1), max_features=512)
        idx1, ok = match.match_ratio(f0.desc, f0.valid, f1.desc, f1.valid,
                                     ratio=0.8)
        ok = np.asarray(ok)
        assert ok.sum() > 60, f"only {ok.sum()} matches"
        uv0 = np.asarray(f0.uv)[ok]
        uv1m = np.asarray(f1.uv)[np.asarray(idx1)[ok]]
        pred = uv0 @ M[:, :2].T + M[:, 2]
        err = np.linalg.norm(pred - uv1m, axis=1)
        inlier_rate = (err < 3.0).mean()
        assert inlier_rate > 0.8, f"inlier rate {inlier_rate:.2f}"

    def test_static_shapes(self, pair):
        img0, _, _ = pair
        f = sift.detect_and_compute(jnp.asarray(img0), max_features=256)
        assert f.uv.shape == (256, 2)
        assert f.desc.shape == (256, 128)


class TestMatch:
    def test_exact_match_recovery(self, rng):
        d0 = rng.normal(size=(100, 128)).astype(np.float32)
        d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
        perm = rng.permutation(100)
        d1 = d0[perm] + rng.normal(scale=0.01, size=(100, 128)).astype(np.float32)
        idx1, ok = match.match_ratio(
            jnp.asarray(d0), jnp.ones(100, bool), jnp.asarray(d1),
            jnp.ones(100, bool), ratio=0.8,
        )
        ok = np.asarray(ok)
        assert ok.sum() > 95
        inv = np.argsort(perm)
        assert (np.asarray(idx1)[ok] == inv[perm][inv][np.arange(100)][ok]).all() or \
               (perm[np.asarray(idx1)[ok]] == np.arange(100)[ok]).all()

    def test_ratio_rejects_ambiguous(self, rng):
        d = rng.normal(size=(1, 128)).astype(np.float32)
        d0 = d
        d1 = np.concatenate([d + 1e-3, d - 1e-3])  # two near-identical
        idx1, ok = match.match_ratio(
            jnp.asarray(d0), jnp.ones(1, bool), jnp.asarray(d1),
            jnp.ones(2, bool), ratio=0.8,
        )
        assert not bool(ok[0])

    def test_invalid_rows_excluded(self, rng):
        d0 = rng.normal(size=(10, 32)).astype(np.float32)
        d1 = d0.copy()
        v1 = np.ones(10, bool); v1[3] = False
        idx1, ok = match.match_ratio(
            jnp.asarray(d0), jnp.ones(10, bool), jnp.asarray(d1),
            jnp.asarray(v1), ratio=0.9,
        )
        assert not bool(np.asarray(idx1)[np.asarray(ok)].__contains__(3)) or \
               3 not in np.asarray(idx1)[np.asarray(ok)]

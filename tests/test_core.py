"""Golden-value tests for core math vs OpenCV / SciPy oracles (SURVEY.md §4)."""
import cv2
import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from monocular_visual_odometry_va4mr_tpu.core import camera, lie, slots


class TestSO3:
    def test_exp_matches_rodrigues(self, rng):
        for _ in range(20):
            w = rng.normal(size=3) * rng.uniform(0.01, 3.0)
            R_cv, _ = cv2.Rodrigues(w.reshape(3, 1))
            R_jax = np.asarray(lie.so3_exp(jnp.asarray(w, jnp.float32)))
            np.testing.assert_allclose(R_jax, R_cv, atol=1e-5)

    def test_exp_small_angle(self):
        w = jnp.array([1e-9, -1e-9, 1e-9], jnp.float32)
        R = lie.so3_exp(w)
        np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-6)
        assert np.all(np.isfinite(np.asarray(jax.jacobian(lie.so3_exp)(w))))

    def test_log_roundtrip(self, rng):
        for scale in [1e-3, 0.5, 2.0, 3.0]:
            w = rng.normal(size=3)
            w = w / np.linalg.norm(w) * scale
            R = lie.so3_exp(jnp.asarray(w, jnp.float32))
            w2 = np.asarray(lie.so3_log(R))
            np.testing.assert_allclose(w2, w, atol=2e-3)

    def test_log_near_pi(self, rng):
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        w = axis * (np.pi - 1e-4)
        R = Rotation.from_rotvec(w).as_matrix()
        w2 = np.asarray(lie.so3_log(jnp.asarray(R, jnp.float32)))
        R2 = Rotation.from_rotvec(np.asarray(w2, np.float64)).as_matrix()
        np.testing.assert_allclose(R2, R, atol=1e-3)


class TestSE3:
    def test_exp_log_roundtrip(self, rng):
        for _ in range(10):
            xi = rng.normal(size=6).astype(np.float32)
            T = lie.se3_exp(jnp.asarray(xi))
            xi2 = np.asarray(lie.se3_log(T))
            np.testing.assert_allclose(xi2, xi, atol=1e-3)

    def test_invert(self, rng):
        xi = rng.normal(size=6).astype(np.float32)
        T = lie.se3_exp(jnp.asarray(xi))
        I = np.asarray(T @ lie.invert_se3(T))
        np.testing.assert_allclose(I, np.eye(4), atol=1e-5)

    def test_invert_rt_matches_reference_formula(self, rng):
        R = Rotation.random(random_state=0).as_matrix().astype(np.float32)
        t = rng.normal(size=3).astype(np.float32)
        Ri, ti = lie.invert_rt(jnp.asarray(R), jnp.asarray(t))
        # Reference invert_transform: Rnew = R.T; tnew = -Rnew @ t
        np.testing.assert_allclose(np.asarray(Ri), R.T, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ti), -R.T @ t, atol=1e-5)


class TestCamera:
    K = np.array([[718.856, 0, 607.1928], [0, 718.856, 185.2157], [0, 0, 1]])

    def test_matrix_roundtrip(self):
        cam = camera.Camera.from_matrix(self.K)
        np.testing.assert_allclose(np.asarray(cam.matrix()), self.K, rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(cam.inv_matrix()), np.linalg.inv(self.K), rtol=1e-5
        )

    def test_project_backproject(self, rng):
        cam = camera.Camera.from_matrix(self.K)
        xyz = rng.uniform(1, 50, size=(100, 3)).astype(np.float32)
        uv = cam.project(jnp.asarray(xyz))
        rays = np.asarray(cam.backproject(uv))
        # Ray * depth should reconstruct the point.
        np.testing.assert_allclose(rays * xyz[:, 2:3], xyz, rtol=1e-4)

    def test_project_matches_cv2(self, rng):
        cam = camera.Camera.from_matrix(self.K)
        xyz = rng.uniform(1, 50, size=(50, 3))
        uv_cv, _ = cv2.projectPoints(
            xyz, np.zeros(3), np.zeros(3), self.K, np.zeros(4)
        )
        uv = np.asarray(cam.project(jnp.asarray(xyz, jnp.float32)))
        np.testing.assert_allclose(uv, uv_cv.squeeze(1), atol=1e-2)


class TestSlots:
    def test_alloc_into_free(self):
        valid = jnp.array([True, False, True, False, False])
        new_mask = jnp.array([True, True, False, True])
        slot, acc = slots.alloc_slots(valid, new_mask)
        assert np.asarray(acc).tolist() == [True, True, False, True]
        assert np.asarray(slot)[np.asarray(acc)].tolist() == [1, 3, 4]

    def test_overflow_dropped(self):
        valid = jnp.array([True, False, True])
        new_mask = jnp.array([True, True, True])
        slot, acc = slots.alloc_slots(valid, new_mask)
        assert np.asarray(acc).tolist() == [True, False, False]
        table = jnp.zeros((3, 2))
        vals = jnp.ones((3, 2))
        out = slots.scatter_rows(table, slot, vals)
        assert np.asarray(out)[1].tolist() == [1.0, 1.0]
        assert np.count_nonzero(np.asarray(out)) == 2

    def test_masked_top_k(self):
        scores = jnp.array([5.0, 9.0, 1.0, 7.0])
        mask = jnp.array([True, False, True, True])
        vals, idx, ok = slots.masked_top_k(scores, mask, 3)
        assert np.asarray(idx).tolist() == [3, 0, 2]
        assert np.asarray(ok).all()

"""Pinhole camera model.

The reference carries the intrinsics as a dense 3x3 ``K`` plus its inverse
(reference VisualOdometryPipeLine.py:37-38) and forms projection matrices
``K @ [R|t]`` ad hoc (reference VisualOdometryPipeLine.py:171,:188-193).  Here
the camera is a small pytree of scalars so projection/backprojection stay
cheap vectorized ops instead of generic 3x3 matmuls, while ``matrix()``
round-trips to the dense form for the linear-algebra kernels that want it.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Camera(NamedTuple):
    """Pinhole intrinsics. All fields are f32 scalars (a jittable pytree)."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray

    @staticmethod
    def from_matrix(K) -> "Camera":
        K = jnp.asarray(K, dtype=jnp.float32)
        return Camera(fx=K[0, 0], fy=K[1, 1], cx=K[0, 2], cy=K[1, 2])

    def matrix(self) -> jnp.ndarray:
        """Dense 3x3 intrinsics matrix K."""
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack(
            [
                jnp.stack([self.fx, z, self.cx]),
                jnp.stack([z, self.fy, self.cy]),
                jnp.stack([z, z, o]),
            ]
        )

    def inv_matrix(self) -> jnp.ndarray:
        """Closed-form K^-1 (reference VisualOdometryPipeLine.py:38 uses
        ``np.linalg.inv``; for a pinhole K the inverse is analytic)."""
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack(
            [
                jnp.stack([1.0 / self.fx, z, -self.cx / self.fx]),
                jnp.stack([z, 1.0 / self.fy, -self.cy / self.fy]),
                jnp.stack([z, z, o]),
            ]
        )

    def project(self, xyz_cam: jnp.ndarray) -> jnp.ndarray:
        """Camera-frame points (..., 3) -> pixel coords (..., 2).

        No distortion: the reference passes ``distCoeffs=np.zeros(4)`` to PnP
        (reference VisualOdometryPipeLine.py:343), i.e. rectified images.
        """
        z = xyz_cam[..., 2]
        u = self.fx * xyz_cam[..., 0] / z + self.cx
        v = self.fy * xyz_cam[..., 1] / z + self.cy
        return jnp.stack([u, v], axis=-1)

    def backproject(self, uv: jnp.ndarray) -> jnp.ndarray:
        """Pixel coords (..., 2) -> unit-depth rays (..., 3) (K^-1 @ hom(uv)).

        The reference builds these rays for the baseline-angle gate
        (reference VisualOdometryPipeLine.py:131-143)."""
        x = (uv[..., 0] - self.cx) / self.fx
        y = (uv[..., 1] - self.cy) / self.fy
        return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)

    def normalize(self, uv: jnp.ndarray) -> jnp.ndarray:
        """Pixel coords (..., 2) -> normalized image coords (..., 2)."""
        x = (uv[..., 0] - self.cx) / self.fx
        y = (uv[..., 1] - self.cy) / self.fy
        return jnp.stack([x, y], axis=-1)


def world_to_cam(T_CW: jnp.ndarray, xyz_w: jnp.ndarray) -> jnp.ndarray:
    """Apply a camera-from-world transform (4,4) to points (..., 3)."""
    return xyz_w @ T_CW[:3, :3].T + T_CW[:3, 3]


def projection_matrix(cam: Camera, T_CW: jnp.ndarray) -> jnp.ndarray:
    """3x4 projection P = K [R|t] from a camera-from-world (4,4) transform.

    Equivalent of ``self.K @ np.hstack((R_WC, t_WC))`` in the reference
    (VisualOdometryPipeLine.py:171,:189) under our single pose convention.
    """
    return cam.matrix() @ T_CW[:3, :4]

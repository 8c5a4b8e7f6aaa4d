"""Pose-graph optimization: drifted odometry + loop closure must snap back."""
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from monocular_visual_odometry_va4mr_tpu.backend import posegraph
from monocular_visual_odometry_va4mr_tpu.core import lie


def circle_trajectory(N=24, radius=5.0):
    """Ground-truth poses around a circle, ending where it started."""
    T = np.zeros((N, 4, 4))
    for k in range(N):
        ang = 2 * np.pi * k / N
        R_WC = Rotation.from_euler("y", ang).as_matrix()
        C = np.array([radius * np.sin(ang), 0.0, radius * (1 - np.cos(ang))])
        Ti = np.eye(4)
        Ti[:3, :3] = R_WC.T
        Ti[:3, 3] = -R_WC.T @ C
        T[k] = Ti
    return T


class TestPoseGraph:
    def test_consistent_graph_zero_cost(self):
        T = jnp.asarray(circle_trajectory(), jnp.float32)
        g = posegraph.odometry_edges(T)
        assert float(posegraph.graph_cost(g)) < 1e-6

    def test_loop_closure_removes_drift(self, rng):
        T_gt = circle_trajectory(N=20)
        # Corrupt odometry: accumulate noisy relative motions.
        T_noisy = [T_gt[0]]
        for k in range(1, 20):
            rel = T_gt[k] @ np.linalg.inv(T_gt[k - 1])
            d = np.eye(4)
            d[:3, :3] = Rotation.from_rotvec(rng.normal(0, 0.01, 3)).as_matrix()
            d[:3, 3] = rng.normal(0, 0.03, 3)
            T_noisy.append(d @ rel @ T_noisy[-1])
        T_noisy = np.stack(T_noisy)

        g = posegraph.PoseGraph(
            T_CW=jnp.asarray(T_noisy, jnp.float32),
            edge_i=jnp.arange(19, dtype=jnp.int32),
            edge_j=jnp.arange(1, 20, dtype=jnp.int32),
            T_meas=jnp.asarray(
                np.stack([T_noisy[k + 1] @ np.linalg.inv(T_noisy[k])
                          for k in range(19)]), jnp.float32),
            weight=jnp.ones(19, jnp.float32),
        )
        # Loop closure: node 19 -> node 0 with the TRUE relative pose.
        T_loop = jnp.asarray(
            T_gt[0] @ np.linalg.inv(T_gt[19]), jnp.float32
        )
        g = posegraph.add_edge(g, 19, 0, T_loop, weight=5.0)

        drift_before = np.linalg.norm(
            np.asarray(lie.invert_se3(jnp.asarray(T_noisy[-1], jnp.float32)))[:3, 3]
            - np.linalg.inv(T_gt[-1])[:3, 3]
        )
        out, costs = posegraph.optimize(g, iters=15, damping=1e-5)
        costs = np.asarray(costs)
        assert costs[-1] < costs[0] * 0.5

        # End-pose drift must shrink substantially after closing the loop.
        T_out = np.asarray(out.T_CW)
        drift_after = np.linalg.norm(
            np.linalg.inv(T_out[-1])[:3, 3] - np.linalg.inv(T_gt[-1])[:3, 3]
        )
        assert drift_after < drift_before * 0.5, (drift_before, drift_after)

    def test_add_edge_shapes(self):
        T = jnp.asarray(circle_trajectory(N=5), jnp.float32)
        g = posegraph.odometry_edges(T)
        g2 = posegraph.add_edge(g, 4, 0, jnp.eye(4))
        assert g2.edge_i.shape == (5,)
        assert g2.T_meas.shape == (5, 4, 4)

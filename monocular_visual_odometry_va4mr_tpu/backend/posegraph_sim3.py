"""Pose-graph optimization over Sim(3) — monocular scale-drift correction.

NEW capability, beyond both the reference (raw pose list only, reference
VisualOdometryPipeLine.py:41,:371) and the SE(3) graph in
backend/posegraph.py: monocular odometry drifts in SCALE as well as pose,
and an SE(3) graph structurally cannot absorb scale error — its loop edges
can only redistribute rotation/translation.  Following Strasdat et al.
("Scale drift-aware large scale monocular SLAM", RSS 2010), nodes here live
on Sim(3) (7 DoF: pose + scale):

  * odometry edges measure S_j S_i^-1 of the VO chain (relative scale 1 —
    the odometry believes its own scale);
  * loop-closure edges carry a measured relative pose AND relative scale
    (estimated from the depth ratio of co-observed structure,
    pipeline/posegraph_runner.py);
  * residual r_e = log_sim3( S_meas^-1 · S_j · S_i^-1 )  (7,) — autodiff
    gives exact edge Jacobians under left-mult updates, batched with vmap;
  * dense (7N, 7N) normal equations, gauge fixed on node 0 (pins the global
    pose AND the global scale), LM damping;
  * after optimization each node's camera pose is [[R, t/s]]
    (core/lie.sim3_to_se3), absorbing the per-node scale correction.

Same TPU-shaped design as the SE(3) graph: fixed edge tables, vmap-batched
autodiff Jacobians, dense solve (keyframe counts are O(10^2-10^3)).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie


class Sim3Graph(NamedTuple):
    S_CW: jnp.ndarray  # (N, 4, 4) node similarities [[s*R, t], [0, 1]]
    edge_i: jnp.ndarray  # (E,) int32 source node
    edge_j: jnp.ndarray  # (E,) int32 target node
    S_meas: jnp.ndarray  # (E, 4, 4) measured S_j * S_i^-1
    weight: jnp.ndarray  # (E,) f32 (0 = invalid edge)


def from_se3_chain(T_CW: jnp.ndarray) -> Sim3Graph:
    """Lift an SE(3) trajectory to a Sim(3) chain graph (all scales 1)."""
    N = T_CW.shape[0]
    i = jnp.arange(N - 1, dtype=jnp.int32)
    j = i + 1
    S_meas = jax.vmap(lambda a, b: b @ lie.invert_sim3(a))(
        T_CW[:-1], T_CW[1:])
    return Sim3Graph(T_CW, i, j, S_meas, jnp.ones(N - 1, jnp.float32))


def add_loop_edge(graph: Sim3Graph, i: int, j: int, R: jnp.ndarray,
                  t: jnp.ndarray, s_rel: float,
                  weight: float = 1.0) -> Sim3Graph:
    """Append a loop-closure edge S_ji = [[s_rel * R, t], [0, 1]].

    (R, t): measured rigid transform camera_i -> camera_j, with |t| already
    scaled to node i's local metric scale; ``s_rel``: measured scale of
    node j's odometry relative to node i's (depth-ratio estimate)."""
    S = lie.sim3_from_rt_s(jnp.asarray(R, jnp.float32),
                           jnp.asarray(t, jnp.float32), float(s_rel))
    return Sim3Graph(
        graph.S_CW,
        jnp.concatenate([graph.edge_i, jnp.asarray([i], jnp.int32)]),
        jnp.concatenate([graph.edge_j, jnp.asarray([j], jnp.int32)]),
        jnp.concatenate([graph.S_meas, S[None]]),
        jnp.concatenate([graph.weight, jnp.asarray([weight], jnp.float32)]),
    )


def _edge_residual(xi_i, xi_j, S_i, S_j, S_meas):
    """Residual under left-mult updates exp(xi) S.  (7,)"""
    Si = lie.sim3_exp(xi_i) @ S_i
    Sj = lie.sim3_exp(xi_j) @ S_j
    return lie.sim3_log(lie.invert_sim3(S_meas) @ (Sj @ lie.invert_sim3(Si)))


def graph_cost(graph: Sim3Graph) -> jnp.ndarray:
    z = jnp.zeros(7)
    r = jax.vmap(
        lambda i, j, Sm: _edge_residual(z, z, graph.S_CW[i], graph.S_CW[j],
                                        Sm)
    )(graph.edge_i, graph.edge_j, graph.S_meas)
    return 0.5 * jnp.sum(graph.weight * jnp.sum(r * r, -1))


@functools.partial(jax.jit, static_argnames=("iters",))
def optimize(graph: Sim3Graph, *, iters: int = 10, damping: float = 1e-6,
             robust_delta: float = None):
    """Gauss-Newton Sim(3) pose-graph optimization; node 0 is the gauge
    anchor (pose + scale).  Returns (graph with refined S_CW, costs).

    ``robust_delta``: optional Huber threshold on the per-edge residual
    norm (IRLS): edges with ||r|| <= delta keep full weight, larger
    residuals are downweighted by delta/||r|| — so one confidently-wrong
    loop edge (repetitive structure) cannot drag the whole graph, while
    consistent odometry/loop edges are untouched."""
    N = graph.S_CW.shape[0]
    rb_delta = jnp.float32(1e30 if robust_delta is None else robust_delta)

    def gn(S_CW, it):
        z = jnp.zeros(7)
        delta_it = rb_delta

        def edge_terms(i, j, Sm, w):
            Si = S_CW[i]
            Sj = S_CW[j]
            r = _edge_residual(z, z, Si, Sj, Sm)
            Ji = jax.jacobian(_edge_residual, argnums=0)(z, z, Si, Sj, Sm)
            Jj = jax.jacobian(_edge_residual, argnums=1)(z, z, Si, Sj, Sm)
            # sqrt(w) on residual AND Jacobians -> the normal equations
            # weight each edge by w, consistent with graph_cost (advisor
            # round-4: scaling by w weighted the solve by w^2).  The Huber
            # IRLS factor multiplies the same way.
            w_r = jnp.minimum(1.0, delta_it / jnp.maximum(
                jnp.linalg.norm(r), 1e-12))
            sw = jnp.sqrt(w * w_r)
            return r * sw, Ji * sw, Jj * sw

        r, Ji, Jj = jax.vmap(edge_terms)(
            graph.edge_i, graph.edge_j, graph.S_meas, graph.weight
        )  # (E,7), (E,7,7), (E,7,7)

        H = jnp.zeros((N, 7, N, 7))
        g = jnp.zeros((N, 7))
        ii = graph.edge_i
        jj = graph.edge_j
        HtH_ii = jnp.einsum("eai,eaj->eij", Ji, Ji)
        HtH_jj = jnp.einsum("eai,eaj->eij", Jj, Jj)
        HtH_ij = jnp.einsum("eai,eaj->eij", Ji, Jj)
        H = H.at[ii, :, ii, :].add(HtH_ii)
        H = H.at[jj, :, jj, :].add(HtH_jj)
        H = H.at[ii, :, jj, :].add(HtH_ij)
        H = H.at[jj, :, ii, :].add(jnp.swapaxes(HtH_ij, -1, -2))
        g = g.at[ii].add(jnp.einsum("eai,ea->ei", Ji, r))
        g = g.at[jj].add(jnp.einsum("eai,ea->ei", Jj, r))

        # Gauge: freeze node 0 (7 DoF — pose and global scale).
        H = H.at[0].set(0.0).at[:, :, 0, :].set(0.0)
        H = H.at[0, :, 0, :].set(jnp.eye(7))
        g = g.at[0].set(0.0)

        Hm = H.reshape(7 * N, 7 * N) + damping * jnp.eye(7 * N)
        delta = jnp.linalg.solve(Hm, -g.reshape(-1)).reshape(N, 7)
        S_new = jax.vmap(lambda d, S: lie.sim3_exp(d) @ S)(delta, S_CW)

        cost = 0.5 * jnp.sum(jnp.sum(r * r, -1))
        return S_new, cost

    # Full-f32 dots, same rationale as backend/ba.py run_ba.
    with jax.default_matmul_precision("float32"):
        S_out, costs = jax.lax.scan(gn, graph.S_CW,
                                    jnp.arange(iters))
    return graph._replace(S_CW=S_out), costs


def corrected_poses(graph: Sim3Graph) -> jnp.ndarray:
    """(N, 4, 4) SE(3) camera extrinsics from the optimized Sim(3) nodes."""
    return jax.vmap(lie.sim3_to_se3)(graph.S_CW)


def edge_residual_norms(graph: Sim3Graph) -> jnp.ndarray:
    """(E,) unweighted residual norms at the graph's current nodes."""
    z = jnp.zeros(7)
    r = jax.vmap(
        lambda i, j, Sm: _edge_residual(z, z, graph.S_CW[i], graph.S_CW[j],
                                        Sm)
    )(graph.edge_i, graph.edge_j, graph.S_meas)
    return jnp.linalg.norm(r, axis=-1)


def optimize_consistent(graph: Sim3Graph, *, n_odo: int, iters: int = 15,
                        damping: float = 1e-4, robust_delta: float = 0.5,
                        suspect_factor: float = 1.5,
                        suspect_floor: float = 0.15, gain: float = 0.5,
                        verbose: bool = False):
    """Huber-robust optimize + leave-one-out consistency pruning of loop
    edges (edges with index >= ``n_odo``).

    A Huber kernel BOUNDS a wrong loop edge's influence but cannot remove
    it: at the corrupted equilibrium the wrong edge's own residual can look
    moderate while its error hides as stress spread over the odometry
    edges.  The discriminator that works is consistency: re-optimizing
    WITHOUT a genuinely-wrong edge collapses the total cost (everything
    else agrees), while removing a correct edge barely changes it.  Only
    suspects (loop residual > max(floor, factor * median)) pay the extra
    solve, so the common all-edges-good case costs one optimization.

    Returns (optimized graph, costs, dropped (n_loops,) bool)."""
    import numpy as np

    out, costs = optimize(graph, iters=iters, damping=damping,
                          robust_delta=robust_delta)
    rn = np.asarray(edge_residual_norms(out))
    loop_rn = rn[n_odo:]
    dropped = np.zeros(len(loop_rn), bool)
    if len(loop_rn) == 0:
        return out, costs, dropped
    med = float(np.median(loop_rn))
    thresh = max(suspect_floor, suspect_factor * med)
    suspects = [e for e in range(len(loop_rn)) if loop_rn[e] > thresh]
    base_cost = float(costs[-1])
    for e in suspects:
        w2 = graph.weight.at[n_odo + e].set(0.0)  # weight 0 removes edge
        out2, c2 = optimize(graph._replace(weight=w2), iters=iters,
                            damping=damping, robust_delta=robust_delta)
        if float(c2[-1]) < gain * base_cost:
            dropped[e] = True
            if verbose:
                print(f"posegraph: dropped inconsistent loop edge {e} "
                      f"(residual {loop_rn[e]:.3f}, cost "
                      f"{base_cost:.3f} -> {float(c2[-1]):.3f})")
    if dropped.any():
        w = graph.weight
        for e in np.flatnonzero(dropped):
            w = w.at[n_odo + int(e)].set(0.0)
        out, costs = optimize(graph._replace(weight=w), iters=iters,
                              damping=damping, robust_delta=robust_delta)
    return out, costs, dropped

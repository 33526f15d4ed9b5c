"""Windowed pose-graph optimization over keyframe poses.

The reference consumes externally-optimized poseframe poses
(updatePoseFramePoses — SURVEY §3.4); the TPU build closes the loop
itself: relative-pose constraints (from direct tracking, odometry, or
loop closures) over the keyframe window are refined by Gauss–Newton on
SE(3), entirely on device. Jacobians come from forward-mode autodiff of
the boxplus-perturbed residual (exact, no hand-derived adjoints), and the
normal system for a <=16-keyframe window is a tiny dense solve — the
Schur-complement/ICI-psum variant for cross-host windows builds on the
same residual structure.

Residual per constraint (i, j):
    r_ij = log( T_meas^-1 ∘ (T_i^-1 ∘ T_j) )   in R^6
with node 0 gauge-fixed.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from flame_ros_tpu.geometry.se3 import SE3, quat_mul, quat_conj, quat_rotate
from flame_ros_tpu.utils.precision import mmh


class PoseGraph(NamedTuple):
    q: jax.Array          # [K, 4] node rotations (camera-to-world)
    t: jax.Array          # [K, 3]
    edges: jax.Array      # [M, 2] int32 (i, j)
    meas_q: jax.Array     # [M, 4] measured T_ij = T_i^-1 T_j
    meas_t: jax.Array     # [M, 3]
    weight: jax.Array     # [M] scalar information weight
    edge_valid: jax.Array  # [M] bool


def _residuals(taus, graph: PoseGraph):
    """All constraint residuals with nodes perturbed by taus [K, 6]
    (right perturbation T exp(tau))."""
    dT = SE3.exp(taus)
    q = quat_mul(graph.q, dT.q)
    t = quat_rotate(graph.q, dT.t) + graph.t
    i = graph.edges[:, 0]
    j = graph.edges[:, 1]
    # T_i^-1 ∘ T_j
    qi_inv = quat_conj(q[i])
    q_ij = quat_mul(qi_inv, q[j])
    t_ij = quat_rotate(qi_inv, t[j] - t[i])
    # T_meas^-1 ∘ T_ij
    qm_inv = quat_conj(graph.meas_q)
    q_err = quat_mul(qm_inv, q_ij)
    t_err = quat_rotate(qm_inv, t_ij - graph.meas_t)
    r = SE3(q_err, t_err).log()                       # [M, 6]
    w = (graph.weight * graph.edge_valid)[:, None]
    return r * jnp.sqrt(jnp.maximum(w, 0.0))


@partial(jax.jit, static_argnames=("num_iters",))
def optimize_pose_graph(graph: PoseGraph, *, num_iters: int = 10,
                        damping: float = 1e-6):
    """Gauss-Newton with node 0 fixed. Returns (q, t, final_cost)."""
    K = graph.q.shape[0]

    def gn(_, g: PoseGraph):
        taus0 = jnp.zeros((K, 6))
        r0 = _residuals(taus0, g)
        J = jax.jacfwd(lambda x: _residuals(x, g))(taus0)  # [M,6,K,6]
        M = r0.shape[0]
        J = J.reshape(M * 6, K * 6)
        r = r0.reshape(M * 6)
        H = mmh(J.T, J) + damping * jnp.eye(K * 6)
        b = mmh(J.T, r)
        # Gauge fix: clamp node 0 by a large prior instead of slicing
        # (keeps shapes static).
        prior = jnp.zeros(K * 6).at[:6].set(1e8)
        H = H + jnp.diag(prior)
        tau = -jnp.linalg.solve(H, b).reshape(K, 6)
        tau = jnp.clip(tau, -1.0, 1.0)
        dT = SE3.exp(tau)
        q = quat_mul(g.q, dT.q)
        t = quat_rotate(g.q, dT.t) + g.t
        return g._replace(q=q, t=t)

    out = jax.lax.fori_loop(0, num_iters, gn, graph)
    final = _residuals(jnp.zeros((K, 6)), out)
    cost = jnp.sum(final * final)
    return out.q, out.t, cost


def make_graph(poses: SE3, edges, meas: SE3, weight=None,
               edge_valid=None) -> PoseGraph:
    edges = jnp.asarray(edges, jnp.int32)
    M = edges.shape[0]
    return PoseGraph(
        q=jnp.asarray(poses.q), t=jnp.asarray(poses.t),
        edges=edges,
        meas_q=jnp.asarray(meas.q), meas_t=jnp.asarray(meas.t),
        weight=(jnp.ones(M) if weight is None
                else jnp.asarray(weight, jnp.float32)),
        edge_valid=(jnp.ones(M, bool) if edge_valid is None
                    else jnp.asarray(edge_valid, bool)))

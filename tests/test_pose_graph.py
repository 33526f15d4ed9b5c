import numpy as np
import jax.numpy as jnp

from flame_ros_tpu.geometry.se3 import SE3
from flame_ros_tpu.models.pose_graph import make_graph, optimize_pose_graph


def _chain_poses(rng, K):
    taus = rng.normal(0, 0.3, (K - 1, 6)).astype(np.float32)
    poses = [SE3.identity()]
    for k in range(K - 1):
        poses.append(poses[-1] @ SE3.exp(jnp.asarray(taus[k])))
    q = jnp.stack([p.q for p in poses])
    t = jnp.stack([p.t for p in poses])
    return SE3(q, t)


def _rel(poses: SE3, i, j):
    Ti = SE3(poses.q[i], poses.t[i])
    Tj = SE3(poses.q[j], poses.t[j])
    return Ti.inverse() @ Tj


def test_recovers_chain_from_noisy_init(rng):
    K = 6
    true = _chain_poses(rng, K)
    # Perfect odometry constraints + loop constraint 0->K-1.
    edges = [(i, i + 1) for i in range(K - 1)] + [(0, K - 1)]
    meas = [_rel(true, i, j) for i, j in edges]
    meas_se3 = SE3(jnp.stack([m.q for m in meas]),
                   jnp.stack([m.t for m in meas]))
    # Corrupt all but node 0.
    noisy_q, noisy_t = [np.asarray(true.q[0])], [np.asarray(true.t[0])]
    for k in range(1, K):
        d = SE3.exp(jnp.asarray(rng.normal(0, 0.05, 6).astype(np.float32)))
        Tk = SE3(true.q[k], true.t[k]) @ d
        noisy_q.append(np.asarray(Tk.q))
        noisy_t.append(np.asarray(Tk.t))
    init = SE3(jnp.asarray(np.stack(noisy_q)), jnp.asarray(np.stack(noisy_t)))

    g = make_graph(init, edges, meas_se3)
    q, t, cost = optimize_pose_graph(g, num_iters=15)
    assert float(cost) < 1e-8, f"final cost {cost}"
    for k in range(K):
        d = SE3(q[k], t[k]).inverse() @ SE3(true.q[k], true.t[k])
        tau = np.asarray(d.log())
        assert np.linalg.norm(tau) < 1e-3, f"node {k} err {np.linalg.norm(tau)}"


def test_gauge_fixed_node0(rng):
    K = 4
    true = _chain_poses(rng, K)
    edges = [(i, i + 1) for i in range(K - 1)]
    meas = [_rel(true, i, j) for i, j in edges]
    meas_se3 = SE3(jnp.stack([m.q for m in meas]),
                   jnp.stack([m.t for m in meas]))
    g = make_graph(true, edges, meas_se3)
    q, t, cost = optimize_pose_graph(g, num_iters=5)
    np.testing.assert_allclose(np.asarray(t[0]), np.asarray(true.t[0]),
                               atol=1e-5)
    assert float(cost) < 1e-9


def test_invalid_edges_ignored(rng):
    K = 3
    true = _chain_poses(rng, K)
    edges = [(0, 1), (1, 2), (0, 2)]
    meas = [_rel(true, 0, 1), _rel(true, 1, 2),
            SE3.exp(jnp.asarray(np.ones(6, np.float32)))]  # garbage
    meas_se3 = SE3(jnp.stack([m.q for m in meas]),
                   jnp.stack([m.t for m in meas]))
    g = make_graph(true, edges, meas_se3,
                   edge_valid=[True, True, False])
    q, t, cost = optimize_pose_graph(g, num_iters=5)
    assert float(cost) < 1e-9  # garbage edge masked out

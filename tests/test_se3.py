import numpy as np
import jax.numpy as jnp

from flame_ros_tpu.geometry.se3 import (
    SE3, quat_mul, quat_rotate, matrix_from_quat, quat_from_matrix,
    random_se3,
)


def _rand_se3(rng, n=None):
    if n is None:
        return random_se3(rng)
    return SE3(
        jnp.stack([random_se3(rng).q for _ in range(n)]),
        jnp.stack([random_se3(rng).t for _ in range(n)]),
    )


def test_identity_compose(rng):
    T = random_se3(rng)
    I = SE3.identity()
    for P in [T @ I, I @ T]:
        np.testing.assert_allclose(P.q, T.q, atol=1e-6)
        np.testing.assert_allclose(P.t, T.t, atol=1e-6)


def test_inverse(rng):
    T = random_se3(rng)
    TI = T @ T.inverse()
    np.testing.assert_allclose(np.abs(TI.q), [1, 0, 0, 0], atol=1e-5)
    np.testing.assert_allclose(TI.t, np.zeros(3), atol=1e-5)


def test_apply_matches_matrix(rng):
    T = random_se3(rng)
    pts = rng.normal(size=(10, 3)).astype(np.float32)
    out = T.apply(jnp.asarray(pts))
    M = np.asarray(T.matrix())
    expected = pts @ M[:3, :3].T + M[:3, 3]
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_matrix_quat_roundtrip(rng):
    for _ in range(20):
        T = random_se3(rng)
        q2 = quat_from_matrix(matrix_from_quat(T.q))
        q = np.asarray(T.q)
        if q[0] < 0:
            q = -q
        np.testing.assert_allclose(q2, q, atol=1e-5)


def test_exp_log_roundtrip(rng):
    tau = rng.normal(0, 0.5, size=6).astype(np.float32)
    T = SE3.exp(jnp.asarray(tau))
    np.testing.assert_allclose(T.log(), tau, atol=1e-4)


def test_exp_log_small_angle():
    tau = jnp.array([0.1, -0.2, 0.3, 1e-8, -1e-8, 1e-9])
    T = SE3.exp(tau)
    np.testing.assert_allclose(T.log(), tau, atol=1e-6)


def test_batched_ops(rng):
    Ts = _rand_se3(rng, 5)
    pts = jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))
    out = Ts.apply(pts)
    for i in range(5):
        single = SE3(Ts.q[i], Ts.t[i]).apply(pts[i])
        np.testing.assert_allclose(out[i], single, atol=1e-6)


def test_compose_associative(rng):
    A, B, C = (random_se3(rng) for _ in range(3))
    L = (A @ B) @ C
    R = A @ (B @ C)
    q_l, q_r = np.asarray(L.q), np.asarray(R.q)
    if np.dot(q_l, q_r) < 0:
        q_r = -q_r
    np.testing.assert_allclose(q_l, q_r, atol=1e-5)
    np.testing.assert_allclose(L.t, R.t, atol=1e-5)


def test_xyzw_constructor():
    # TUM convention: qx qy qz qw
    T = SE3.from_quat_trans([0, 0, 0, 1], [1, 2, 3], xyzw=True)
    np.testing.assert_allclose(T.q, [1, 0, 0, 0], atol=1e-7)
    np.testing.assert_allclose(T.t, [1, 2, 3], atol=1e-7)

"""SE(3) rigid transforms as JAX-native (quaternion, translation) arrays.

Capability parity with the reference's Sophus::SE3f usage
(reference: src/ros_sensor_streams/conversions.h:73-113 — quaternion +
translation round-trips) but built for batching: every op broadcasts over
leading axes, so a pose table of shape [..., 7] works under vmap / shard_map.

Quaternion convention: (w, x, y, z), unit norm, Hamilton product. Poses map
camera coordinates to world coordinates: X_w = R X_c + t.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from flame_ros_tpu.utils.precision import einsumh


class SE3(NamedTuple):
    """Batchable rigid transform. q: [..., 4] (w,x,y,z); t: [..., 3]."""
    q: jax.Array
    t: jax.Array

    # ---- constructors -------------------------------------------------
    @staticmethod
    def identity(batch_shape=(), dtype=jnp.float32) -> "SE3":
        q = jnp.broadcast_to(
            jnp.array([1.0, 0.0, 0.0, 0.0], dtype), (*batch_shape, 4))
        t = jnp.zeros((*batch_shape, 3), dtype)
        return SE3(q, t)

    @staticmethod
    def from_matrix(T) -> "SE3":
        T = jnp.asarray(T)
        return SE3(quat_from_matrix(T[..., :3, :3]), T[..., :3, 3])

    @staticmethod
    def from_quat_trans(q, t, *, xyzw: bool = False) -> "SE3":
        q = jnp.asarray(q, jnp.float32)
        t = jnp.asarray(t, jnp.float32)
        if xyzw:  # ROS / TUM ordering (x,y,z,w) -> (w,x,y,z)
            q = jnp.concatenate([q[..., 3:4], q[..., :3]], axis=-1)
        return SE3(quat_normalize(q), t)

    # ---- core ops -----------------------------------------------------
    def compose(self, other: "SE3") -> "SE3":
        """self ∘ other: apply `other` first, then `self`."""
        return SE3(quat_mul(self.q, other.q),
                   quat_rotate(self.q, other.t) + self.t)

    def __matmul__(self, other):
        if isinstance(other, SE3):
            return self.compose(other)
        return self.apply(other)

    def inverse(self) -> "SE3":
        qinv = quat_conj(self.q)
        return SE3(qinv, -quat_rotate(qinv, self.t))

    def apply(self, pts) -> jax.Array:
        """Transform points [..., 3]."""
        return quat_rotate(self.q, pts) + self.t

    def rotate(self, vecs) -> jax.Array:
        return quat_rotate(self.q, vecs)

    def matrix(self) -> jax.Array:
        R = matrix_from_quat(self.q)
        top = jnp.concatenate([R, self.t[..., :, None]], axis=-1)
        bottom = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 0.0, 1.0], R.dtype), (*top.shape[:-2], 1, 4))
        return jnp.concatenate([top, bottom], axis=-2)

    # ---- manifold ops (for BA / pose-noise harness) -------------------
    @staticmethod
    def exp(tau) -> "SE3":
        """Exponential map from twist tau = [v, omega] ([..., 6])."""
        tau = jnp.asarray(tau)
        v, omega = tau[..., :3], tau[..., 3:]
        theta = jnp.linalg.norm(omega, axis=-1, keepdims=True)
        q = quat_exp(omega)
        # V matrix (left Jacobian of SO3) applied to v.
        t = _so3_left_jacobian_apply(omega, theta, v)
        return SE3(q, t)

    def log(self) -> jax.Array:
        omega = quat_log(self.q)
        theta = jnp.linalg.norm(omega, axis=-1, keepdims=True)
        v = _so3_left_jacobian_inv_apply(omega, theta, self.t)
        return jnp.concatenate([v, omega], axis=-1)

    # ---- misc ---------------------------------------------------------
    def normalize(self) -> "SE3":
        return SE3(quat_normalize(self.q), self.t)

    def as_array(self) -> jax.Array:
        """Pack to [..., 7] = (qw,qx,qy,qz,tx,ty,tz)."""
        return jnp.concatenate([self.q, self.t], axis=-1)

    @staticmethod
    def from_array(a) -> "SE3":
        a = jnp.asarray(a)
        return SE3(a[..., :4], a[..., 4:7])


# ---------------------------------------------------------------------------
# Quaternion algebra (Hamilton, (w,x,y,z))
# ---------------------------------------------------------------------------

def quat_normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_conj(q):
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], q.dtype)


def quat_mul(a, b):
    aw, ax, ay, az = (a[..., i] for i in range(4))
    bw, bx, by, bz = (b[..., i] for i in range(4))
    return jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], axis=-1)


def quat_rotate(q, v):
    """Rotate vectors v [..., 3] by quaternions q [..., 4]."""
    qv = q[..., 1:]
    uv = 2.0 * jnp.cross(qv, v)
    return v + q[..., :1] * uv + jnp.cross(qv, uv)


def matrix_from_quat(q):
    w, x, y, z = (q[..., i] for i in range(4))
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    R = jnp.stack([
        1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
        2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
        2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
    ], axis=-1)
    return R.reshape(*q.shape[:-1], 3, 3)


def quat_from_matrix(R):
    """Shepperd's method, branchless for batching."""
    R = jnp.asarray(R)
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # Four candidate computations; pick the numerically best per element.
    qw = jnp.stack([1 + tr, 1 + m00 - m11 - m22,
                    1 - m00 + m11 - m22, 1 - m00 - m11 + m22], axis=-1)
    qw = jnp.sqrt(jnp.maximum(qw, 1e-12)) / 2.0
    c0 = jnp.stack([qw[..., 0], (m21 - m12) / (4 * qw[..., 0]),
                    (m02 - m20) / (4 * qw[..., 0]), (m10 - m01) / (4 * qw[..., 0])], -1)
    c1 = jnp.stack([(m21 - m12) / (4 * qw[..., 1]), qw[..., 1],
                    (m01 + m10) / (4 * qw[..., 1]), (m02 + m20) / (4 * qw[..., 1])], -1)
    c2 = jnp.stack([(m02 - m20) / (4 * qw[..., 2]), (m01 + m10) / (4 * qw[..., 2]),
                    qw[..., 2], (m12 + m21) / (4 * qw[..., 2])], -1)
    c3 = jnp.stack([(m10 - m01) / (4 * qw[..., 3]), (m02 + m20) / (4 * qw[..., 3]),
                    (m12 + m21) / (4 * qw[..., 3]), qw[..., 3]], -1)
    idx = jnp.argmax(jnp.stack([tr, m00, m11, m22], axis=-1), axis=-1)
    cands = jnp.stack([c0, c1, c2, c3], axis=-2)
    q = jnp.take_along_axis(cands, idx[..., None, None].astype(jnp.int32),
                            axis=-2)[..., 0, :]
    # Canonical sign: w >= 0.
    q = jnp.where(q[..., :1] < 0, -q, q)
    return quat_normalize(q)


def quat_exp(omega):
    """so(3) -> unit quaternion. (sqrt has an unbounded derivative at 0,
    so the norm uses a safe epsilon under the root — see the autodiff
    note in _so3_left_jacobian_apply.)"""
    sq = jnp.sum(omega * omega, axis=-1, keepdims=True)
    theta = jnp.sqrt(sq + 1e-24)
    half = 0.5 * theta
    small = sq < 1e-12
    th_safe = jnp.where(small, 1.0, theta)
    k = jnp.where(small, 0.5 - sq / 48.0, jnp.sin(0.5 * th_safe) / th_safe)
    w = jnp.cos(half)
    return jnp.concatenate([w, k * omega], axis=-1)


def quat_log(q):
    """Unit quaternion -> so(3)."""
    q = jnp.where(q[..., :1] < 0, -q, q)  # enforce w>=0 for principal log
    w = jnp.clip(q[..., :1], -1.0, 1.0)
    sq = jnp.sum(q[..., 1:] ** 2, axis=-1, keepdims=True)
    vn = jnp.sqrt(sq + 1e-24)
    small = sq < 1e-12
    vn_safe = jnp.where(small, 1.0, vn)
    theta = 2.0 * jnp.arctan2(vn, w)
    k = jnp.where(small, 2.0 / jnp.maximum(w, 1e-6), theta / vn_safe)
    return k * q[..., 1:]


def _hat(w):
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack([
        z, -wz, wy,
        wz, z, -wx,
        -wy, wx, z,
    ], axis=-1).reshape(*w.shape[:-1], 3, 3)


def _so3_left_jacobian_apply(omega, theta, v):
    # NOTE: the non-small branch must be evaluated with a SAFE theta —
    # jnp.where runs both branches, and a 0/0 in the unselected branch
    # poisons forward-mode derivatives (the pose-graph solver autodiffs
    # through here).
    W = _hat(omega)
    small = theta[..., 0] < 1e-5
    th = jnp.where(small, 1.0, theta[..., 0])
    A = jnp.where(small, 0.5, (1 - jnp.cos(th)) / th**2)[..., None]
    B = jnp.where(small, 1.0 / 6.0, (th - jnp.sin(th)) / th**3)[..., None]
    Wv = einsumh("...ij,...j->...i", W, v)
    WWv = einsumh("...ij,...j->...i", W, Wv)
    return v + A * Wv + B * WWv


def _so3_left_jacobian_inv_apply(omega, theta, t):
    W = _hat(omega)
    small = theta[..., 0] < 1e-5
    th = jnp.where(small, 1.0, theta[..., 0])
    half = 0.5 * th
    cot_coef = (1.0 - half * jnp.cos(half) / jnp.sin(half)) / th**2
    C = jnp.where(small, 1.0 / 12.0, cot_coef)[..., None]
    Wt = einsumh("...ij,...j->...i", W, t)
    WWt = einsumh("...ij,...j->...i", W, Wt)
    return t - 0.5 * Wt + C * WWt


def random_se3(rng: np.random.Generator, sigma_rot: float = 1.0,
               sigma_trans: float = 1.0) -> SE3:
    """Random pose for tests / the pose-noise ablation harness
    (reference: disabled Gaussian SE3 noise block, src/flame_offline_tum.cc:438-489)."""
    omega = rng.normal(0, sigma_rot, 3).astype(np.float32)
    v = rng.normal(0, sigma_trans, 3).astype(np.float32)
    return SE3.exp(jnp.asarray(np.concatenate([v, omega])))

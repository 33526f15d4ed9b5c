"""Trajectory-alignment / ATE metric unit tests (eval/metrics.py).

The tracking-mode acceptance gates (BASELINE config 4) hinge on this
metric, so its alignment math is pinned against constructed cases with
known answers (protocol: TUM RGB-D benchmark evaluate_ate — Horn
alignment then RMSE of residuals)."""
import numpy as np

from flame_ros_tpu.eval.metrics import align_trajectory, ate_rmse


def _traj(n=50, seed=0):
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 4 * np.pi, n)
    pts = np.stack([np.cos(t), np.sin(t), 0.1 * t], axis=1)
    return pts + 0.0 * rng.standard_normal((n, 3))


def _rotz(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])


def test_ate_zero_on_rigidly_transformed_copy():
    gt = _traj()
    R = _rotz(0.7) @ np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0.0]])
    est = (R.T @ (gt - np.array([0.3, -1.2, 2.0])).T).T
    assert ate_rmse(est, gt, align="se3") < 1e-9
    # Raw (origin-aligned) must NOT be zero — the transform is real.
    assert ate_rmse(est, gt, align="none") > 0.1


def test_ate_se3_charges_scale_but_sim3_does_not():
    gt = _traj()
    est = 1.1 * gt  # pure 10% scale error
    se3 = ate_rmse(est, gt, align="se3")
    sim3 = ate_rmse(est, gt, align="sim3")
    assert se3 > 0.05
    assert sim3 < 1e-9
    # And the recovered scale is exact.
    s, R, t = align_trajectory(est, gt, with_scale=True)
    assert abs(s - 1.0 / 1.1) < 1e-9
    assert np.allclose(R, np.eye(3), atol=1e-9)


def test_ate_matches_hand_rmse_for_pure_noise():
    rng = np.random.default_rng(3)
    gt = _traj()
    noise = 0.01 * rng.standard_normal(gt.shape)
    est = gt + noise
    # Alignment can only reduce error vs raw.
    raw = float(np.sqrt(np.mean(np.sum(noise ** 2, axis=1))))
    a = ate_rmse(est, gt, align="se3")
    assert a <= raw + 1e-12
    assert a > 0.5 * raw  # but not collapse it — noise isn't a rigid motion


def test_ate_reflection_guard():
    """Mirrored trajectory: the Umeyama det-correction must pick a proper
    rotation (det +1), not a reflection that would fake a perfect fit."""
    gt = _traj()
    est = gt * np.array([1.0, 1.0, -1.0])  # reflection through z=0
    s, R, t = align_trajectory(est, gt)
    assert np.linalg.det(R) > 0.999
    assert ate_rmse(est, gt, align="se3") > 0.05


# ---- relative pose error (eval.metrics.rpe) --------------------------------

from flame_ros_tpu.eval.metrics import rpe


def _quat_z(a):
    """wxyz quaternion for a rotation of `a` radians about z."""
    return np.array([np.cos(a / 2), 0.0, 0.0, np.sin(a / 2)])


def _pan_traj(n=40, yaw_amp=0.3, radius=0.05):
    """Rotation-dominant pan: large yaw sweep, tiny camera-centre path —
    the regime where ATE bounds almost nothing (VERDICT r4 weak #6)."""
    ts = np.linspace(0, 1, n)
    yaws = yaw_amp * np.sin(2 * np.pi * ts)
    q = np.stack([_quat_z(y) for y in yaws])
    t = np.stack([radius * np.sin(2 * np.pi * ts),
                  radius * (1 - np.cos(2 * np.pi * ts)),
                  np.zeros(n)], axis=1)
    return q, t


def test_rpe_zero_on_identical_trajectories():
    q, t = _pan_traj()
    r = rpe(q, t, q, t, delta=1)
    assert r["trans_rmse"] < 1e-12
    assert r["rot_rmse_deg"] < 1e-5
    assert r["pairs"] == len(t) - 1


def test_rpe_invariant_to_global_left_transform():
    """RPE compares relative motions P_i^-1 P_j, which a global rigid
    transform G (P -> G P) cancels — mount/world-frame choice must not
    change the metric (same invariance the TUM tool has)."""
    q, t = _pan_traj()
    a = 0.9
    Rg = np.array([[np.cos(a), -np.sin(a), 0],
                   [np.sin(a), np.cos(a), 0], [0, 0, 1.0]])
    tg = np.array([2.0, -1.0, 0.5])
    qg = _quat_z(a)

    def qmul(p, r):
        w1, x1, y1, z1 = p
        w2, x2, y2, z2 = r
        return np.array([
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2])

    q2 = np.stack([qmul(qg, qi) for qi in q])
    t2 = (Rg @ t.T).T + tg
    r = rpe(q2, t2, q, t, delta=1)
    assert r["trans_rmse"] < 1e-9
    assert r["rot_rmse_deg"] < 1e-5


def test_rpe_catches_rotation_error_ate_cannot_see():
    """The motivating case: on a 0.3 m pan path, corrupt every estimated
    orientation by a 2-degree wobble while keeping positions PERFECT.
    ATE reads ~0 (it only sees positions); rotational RPE must read ~the
    injected per-frame rotation delta."""
    q, t = _pan_traj()
    rng = np.random.default_rng(7)
    wob = np.radians(2.0) * rng.choice([-1.0, 1.0], size=len(q))
    # Per-frame orientation error alternates +-2 deg -> per-PAIR delta
    # is 0 or 4 deg.
    q_est = np.stack(
        [q[i] if i == 0 else
         np.array([np.cos((np.arctan2(q[i][3], q[i][0]) * 2 + wob[i]) / 2),
                   0, 0,
                   np.sin((np.arctan2(q[i][3], q[i][0]) * 2 + wob[i]) / 2)])
         for i in range(len(q))])
    ate = ate_rmse(t, t, align="se3")
    r = rpe(q_est, t, q, t, delta=1)
    assert ate < 1e-12                      # positions perfect
    assert r["rot_rmse_deg"] > 1.5          # rotations are not
    assert r["rot_max_deg"] < 4.5


def test_rpe_exact_single_frame_rotation_offset():
    """A single frame k with an exact 3-degree yaw offset must produce
    exactly two error pairs (k-1,k) and (k,k+1) of 3 degrees each at
    delta=1, and the translational family must stay zero (pan path,
    rotation applied about the camera centre)."""
    q, t = _pan_traj(n=20, radius=0.0)      # pure rotation: t == 0
    k, off = 10, np.radians(3.0)
    yaw_k = np.arctan2(q[k][3], q[k][0]) * 2
    q_est = q.copy()
    q_est[k] = _quat_z(yaw_k + off)
    r = rpe(q_est, t, q, t, delta=1)
    n_pairs = len(t) - 1
    expect_rms = np.degrees(off) * np.sqrt(2.0 / n_pairs)
    assert abs(r["rot_rmse_deg"] - expect_rms) < 1e-6
    assert abs(r["rot_max_deg"] - 3.0) < 1e-9
    assert r["trans_rmse"] < 1e-12

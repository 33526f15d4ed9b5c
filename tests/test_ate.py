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

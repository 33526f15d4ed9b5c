import numpy as np
import jax.numpy as jnp
import pytest

from flame_ros_tpu.datasets.synthetic import make_sequence, QVGA
from flame_ros_tpu.geometry.se3 import SE3
from flame_ros_tpu.models.tracking import track_frame
from flame_ros_tpu.ops.pyramid import build_pyramid


@pytest.fixture(scope="module")
def seq():
    # 30 frames over the trajectory = realistic 30 fps inter-frame motion.
    return make_sequence(n_frames=30, cam=QVGA, motion="strafe")


def _ref(seq, i=0, L=4):
    pyr = build_pyramid(jnp.asarray(seq.images[i]), L)
    idepth = jnp.asarray(
        np.where(seq.depths[i] > 0, 1.0 / np.maximum(seq.depths[i], 1e-6),
                 np.nan).astype(np.float32))
    return pyr, idepth


def _true_rel(seq, i, j):
    Ti = SE3(seq.poses.q[i], seq.poses.t[i])
    Tj = SE3(seq.poses.q[j], seq.poses.t[j])
    return Tj.inverse() @ Ti


def _err(res, T_true):
    d = SE3(jnp.asarray(res.q), jnp.asarray(res.t)).inverse() @ T_true
    tau = np.asarray(d.log())
    return np.linalg.norm(tau[:3]), np.linalg.norm(tau[3:])


def test_track_recovers_frame_motion(seq):
    """GT-depth direct alignment recovers 30fps inter-frame pose from an
    identity initialization."""
    ref_pyr, ref_idepth = _ref(seq)
    cur_pyr = build_pyramid(jnp.asarray(seq.images[1]), 4)
    T_true = _true_rel(seq, 0, 1)
    res = track_frame(ref_pyr, ref_idepth, cur_pyr,
                      jnp.array([1.0, 0, 0, 0]), jnp.zeros(3),
                      cam=seq.cam, num_levels=4)
    et, er = _err(res, T_true)
    assert et < 0.01, f"translation err {et} m (|t|={np.linalg.norm(np.asarray(T_true.t)):.3f})"
    assert er < 0.005, f"rotation err {er} rad"
    assert int(res.n_inliers) > 1000
    assert float(res.final_cost) < 10.0


def test_track_identity_motion(seq):
    pyr, _ = _ref(seq)
    ref_idepth = jnp.asarray(
        (1.0 / np.maximum(seq.depths[0], 1e-6)).astype(np.float32))
    res = track_frame(pyr, ref_idepth, pyr,
                      jnp.array([1.0, 0, 0, 0]), jnp.zeros(3),
                      cam=seq.cam, num_levels=4)
    assert np.linalg.norm(np.asarray(res.t)) < 1e-3
    assert abs(float(res.q[0])) > 0.99999


def test_track_with_motion_model_init(seq):
    """Keyframe-to-frame tracking over a wider gap, seeded by the previous
    frame's solution (the streaming usage pattern)."""
    ref_pyr, ref_idepth = _ref(seq)
    T_prev = _true_rel(seq, 0, 2)
    cur_pyr = build_pyramid(jnp.asarray(seq.images[3]), 4)
    T_true = _true_rel(seq, 0, 3)
    res = track_frame(ref_pyr, ref_idepth, cur_pyr, T_prev.q, T_prev.t,
                      cam=seq.cam, num_levels=4)
    et, er = _err(res, T_true)
    assert et < 0.01, f"translation err {et}"
    assert er < 0.005


def test_track_cost_flags_divergence(seq):
    """From identity across a huge 0.5 m baseline the solver may not
    converge — final_cost must expose that."""
    ref_pyr, ref_idepth = _ref(seq)
    cur_pyr = build_pyramid(jnp.asarray(seq.images[8]), 4)
    res = track_frame(ref_pyr, ref_idepth, cur_pyr,
                      jnp.array([1.0, 0, 0, 0]), jnp.zeros(3),
                      cam=seq.cam, num_levels=4)
    good = track_frame(ref_pyr, ref_idepth,
                       build_pyramid(jnp.asarray(seq.images[1]), 4),
                       jnp.array([1.0, 0, 0, 0]), jnp.zeros(3),
                       cam=seq.cam, num_levels=4)
    assert float(res.final_cost) > 2.0 * float(good.final_cost)


def test_track_affine_exposure_drift(seq):
    """Auto-exposure robustness (beyond the reference): the current frame
    has a gain/offset change vs the keyframe; joint affine estimation
    recovers both the pose and the exposure model, while the raw
    photometric solve degrades."""
    ref_pyr, ref_idepth = _ref(seq)
    cur = np.clip(1.2 * np.asarray(seq.images[1]) + 15.0, 0, 255)
    cur_pyr = build_pyramid(jnp.asarray(cur.astype(np.float32)), 4)
    T_true = _true_rel(seq, 0, 1)

    res = track_frame(ref_pyr, ref_idepth, cur_pyr,
                      jnp.array([1.0, 0, 0, 0]), jnp.zeros(3),
                      cam=seq.cam, num_levels=4, estimate_affine=True)
    et, er = _err(res, T_true)
    assert et < 0.015, f"translation err {et} m under exposure drift"
    assert er < 0.008, f"rotation err {er} rad under exposure drift"
    # (gain, offset) is a correlated pair (observable through contrast
    # only) — assert the EFFECTIVE intensity map matches the injected
    # 1.2*I + 15 over the working range, not the raw parameters.
    g, o = float(res.gain), float(res.offset)
    for I in (96.0, 128.0, 176.0):
        assert abs((g * I + o) - (1.2 * I + 15.0)) < 12.0, (g, o, I)
    assert float(res.final_cost) < 10.0

    raw = track_frame(ref_pyr, ref_idepth, cur_pyr,
                      jnp.array([1.0, 0, 0, 0]), jnp.zeros(3),
                      cam=seq.cam, num_levels=4, estimate_affine=False)
    assert float(raw.final_cost) > 2.0 * float(res.final_cost)
    et_raw, _ = _err(raw, T_true)
    assert et_raw > 5.0 * et  # raw solve diverges under drift


def test_track_affine_neutral_on_constant_exposure(seq):
    """With no exposure change, affine estimation is behavior-neutral:
    gain ~ 1, offset ~ 0, pose matches the raw solve."""
    ref_pyr, ref_idepth = _ref(seq)
    cur_pyr = build_pyramid(jnp.asarray(seq.images[1]), 4)
    T_true = _true_rel(seq, 0, 1)
    res = track_frame(ref_pyr, ref_idepth, cur_pyr,
                      jnp.array([1.0, 0, 0, 0]), jnp.zeros(3),
                      cam=seq.cam, num_levels=4, estimate_affine=True)
    et, er = _err(res, T_true)
    assert et < 0.01 and er < 0.005
    # Effective intensity map stays near identity in the working range
    # (the raw pair may drift along the gain/offset degeneracy).
    g, o = float(res.gain), float(res.offset)
    for I in (96.0, 128.0, 176.0):
        assert abs((g * I + o) - I) < 12.0, (g, o, I)

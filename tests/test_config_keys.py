"""Tests for config keys wired in round 2: min_error redetection,
check_sticky_obstacles, the epipolar kill-variance plumb, and the
raw-vs-rectified intrinsics split in undistortion (reference:
cfg/flame_nodelet.yaml:70,85,92; src/flame_nodelet.cc:229-263)."""
import numpy as np
import jax.numpy as jnp

from flame_ros_tpu.config import FlameParams
from flame_ros_tpu.datasets.synthetic import make_sequence, QVGA
from flame_ros_tpu.geometry.camera import Pinhole, undistort_maps
from flame_ros_tpu.geometry.se3 import SE3
from flame_ros_tpu.models.engine import Flame, _smooth_step
from flame_ros_tpu.ops.pyramid import build_pyramid


def _params(**over):
    d = {"engine": {"max_features": 512, "max_keyframes": 4,
                    "pd_iters_per_frame": 10}}
    for k, v in over.items():
        d.setdefault(k, {}).update(v)
    return FlameParams.from_dict(d)


def _run_engine(seq, params, n):
    engine = Flame(seq.cam.width, seq.cam.height, cam=seq.cam,
                   params=params)
    for i in range(n):
        pose = SE3(seq.poses.q[i], seq.poses.t[i])
        assert engine.update(seq.timestamps[i], i, pose, seq.images[i],
                             is_poseframe=(i % 6 == 0))
    return engine


def test_min_error_redetection():
    """Occupied cells with high photometric error re-open for detection;
    low-error cells stay closed (reference features/detection/min_error)."""
    seq = make_sequence(n_frames=8, cam=QVGA, motion="strafe")
    # Plenty of free slots so detections are occupancy-limited, not
    # slot-limited.
    engine = _run_engine(seq, _params(engine={"max_features": 2048}), 7)
    engine.flush_stats()

    # Force every cell to report huge mesh photo error, then take one more
    # poseframe: occupied cells must re-open and produce detections.
    hot = engine.state._replace(
        cell_err=jnp.full_like(engine.state.cell_err, 1e4))
    cold = engine.state._replace(
        cell_err=jnp.zeros_like(engine.state.cell_err))

    def pf_detections(state):
        engine.state = state
        ckpt = (engine._num_poseframes, engine._kf_slot)
        pose = SE3(seq.poses.q[7], seq.poses.t[7])
        assert engine.update(seq.timestamps[7], 7, pose, seq.images[7],
                             is_poseframe=True)
        n = engine.flush_stats()["num_detections"]
        engine._num_poseframes, engine._kf_slot = ckpt
        return n

    n_cold = pf_detections(cold)
    n_hot = pf_detections(hot)
    # With all cells re-opened, far more detections fire than with the
    # occupancy mask intact.
    assert n_hot > n_cold + 20, (n_hot, n_cold)


def test_sticky_obstacle_snap():
    """check_sticky_obstacles snaps a vertex whose smoothed idepth claims
    a near obstacle unsupported by its data anchor back to the anchor."""
    cam = QVGA
    imgs = np.random.default_rng(0).uniform(
        0, 255, (cam.height, cam.width)).astype(np.float32)
    pyr = build_pyramid(jnp.asarray(imgs), 3)
    q = jnp.array([1.0, 0, 0, 0], jnp.float32)
    t = jnp.zeros(3, jnp.float32)
    counts = jnp.zeros(7, jnp.float32)
    gt = jnp.zeros((cam.height, cam.width), jnp.float32)

    def run(check: bool):
        # 0 PD sweeps: only the sticky snap may move the primal.
        p = _params(regularization={
            "nltgv2": {"check_sticky_obstacles": check}},
            engine={"pd_iters_per_frame": 0})
        eng = Flame(cam.width, cam.height, cam=cam, params=p)
        st = eng.state
        vx = st.vtx_x.at[0].set(1.5)   # smoothed: obstacle at 0.67 m
        vz = st.vtx_z.at[0].set(0.2)   # measured: 5 m
        ing = st.vtx_in_graph.at[0].set(True)
        st = st._replace(vtx_x=vx, vtx_z=vz, vtx_in_graph=ing,
                         vtx_uv=st.vtx_uv.at[0].set(
                             jnp.array([50.0, 50.0])))
        new_st, _, _ = _smooth_step(st, pyr, q, t, counts, gt,
                                    cam=cam, params=p, has_gt=False)
        return float(new_st.vtx_x[0])

    assert abs(run(True) - 0.2) < 0.05       # snapped to anchor
    assert abs(run(False) - 1.5) < 0.05      # smoothing alone barely moves


def test_max_idepth_var_kill_plumbed():
    """features/tracking/max_idepth_var reaches the epipolar kill gate."""
    seq = make_sequence(n_frames=3, cam=QVGA, motion="strafe")
    p = _params(features={"tracking": {"max_idepth_var": 1e-9}})
    # Frame 0 detects; frame 1's epipolar update kills every feature.
    engine = _run_engine(seq, p, 2)
    rec = engine.flush_stats()
    # Every feature's predicted variance exceeds the kill gate instantly.
    assert rec["num_feats"] == 0
    assert rec["num_fail_max_var"] > 0


def test_undistort_maps_use_raw_intrinsics():
    cam = Pinhole(fx=300.0, fy=300.0, cx=160.0, cy=120.0,
                  width=320, height=240)
    raw_K = np.array([[280.0, 0, 150.0], [0, 285.0, 118.0], [0, 0, 1.0]])
    # Zero distortion: the map must be the pure intrinsics change
    # rectified -> normalized (via cam) -> pixel (via raw_K).
    mu, mv = undistort_maps(cam, np.zeros(5), raw_K=raw_K)
    us = np.arange(cam.width)[None, :].repeat(cam.height, 0)
    vs = np.arange(cam.height)[:, None].repeat(cam.width, 1)
    exp_u = (us - cam.cx) / cam.fx * 280.0 + 150.0
    exp_v = (vs - cam.cy) / cam.fy * 285.0 + 118.0
    np.testing.assert_allclose(mu, exp_u, atol=1e-4)
    np.testing.assert_allclose(mv, exp_v, atol=1e-4)
    # Without raw_K (single-intrinsics calibration): identity.
    mu0, mv0 = undistort_maps(cam, np.zeros(5))
    np.testing.assert_allclose(mu0, us, atol=1e-4)
    np.testing.assert_allclose(mv0, vs, atol=1e-4)


def test_tracking_refresh_fires_under_subsampling():
    """The tracking-keyframe refresh must fire for any subsample_factor
    (a state flag, not img_id residue arithmetic)."""
    from flame_ros_tpu.frontends.nodelet import FlameNodelet

    cam = QVGA
    p = _params(input={"subsample_factor": 2,
                       "poseframe_subsample_factor": 6})
    node = FlameNodelet(cam, p, pose_source="tracking")

    refreshes = []
    node._refresh_track_ref = lambda pose, pyr=None: refreshes.append(1)
    node._estimate_pose = lambda frame: SE3.identity()
    node._pose_graph_update = lambda i, p_: None

    class FakeEngine:
        num_poseframes = 1

        def update(self, *a, **k):
            return True

    node.engine = FakeEngine()
    node.params = p
    img = np.zeros((cam.height, cam.width), np.float32)
    # img_ids 0,2,4,...: with subsample=2 the old residue-==1 check never
    # fired; the flag-based refresh must fire after each poseframe.
    for i in range(0, 16, 2):
        node._process(type("F", (), {
            "img_id": i, "time": float(i), "gray": img, "depth": None,
            "quat": None, "trans": None, "recv_time": 0.0})())
    assert len(refreshes) >= 2

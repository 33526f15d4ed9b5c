import os

import numpy as np
import pytest

from flame_ros_tpu.datasets.associate import associate


def test_associate_basic():
    ia, ib = associate([0.0, 1.0, 2.0], [0.01, 1.5, 1.99])
    # 0.0<->0.01 and 2.0<->1.99 match; 1.0 has nothing within 0.02.
    assert list(ia) == [0, 2]
    assert list(ib) == [0, 2]


def test_associate_one_to_one():
    # Two A's near one B: only the closest keeps it.
    ia, ib = associate([1.0, 1.001], [1.0005], max_diff=0.02)
    assert len(ia) == 1
    assert ib[0] == 0


def test_associate_empty():
    ia, ib = associate([], [1.0])
    assert len(ia) == 0


def _write_png(path, arr):
    import cv2
    cv2.imwrite(str(path), arr)


@pytest.fixture
def tum_fixture(tmp_path, rng):
    d = tmp_path / "tum"
    (d / "rgb").mkdir(parents=True)
    (d / "depth").mkdir()
    lines = []
    for i in range(3):
        img = rng.integers(0, 255, (48, 64, 3), np.uint8)
        _write_png(d / "rgb" / f"{i}.png", img)
        depth = np.full((48, 64), 5000 + 1000 * i, np.uint16)
        _write_png(d / "depth" / f"{i}.png", depth)
        t = 100.0 + i * 0.1
        lines.append(f"{t:.4f} {0.1*i:.3f} 0 0 0 0 0 1 "
                     f"{t:.4f} rgb/{i}.png {t:.4f} depth/{i}.png")
    assoc = d / "assoc.txt"
    assoc.write_text("\n".join(lines) + "\n")
    return d, assoc


def test_tum_stream(tum_fixture):
    from flame_ros_tpu.datasets.tum import TUMRGBDStream
    from flame_ros_tpu.geometry.camera import Pinhole
    d, assoc = tum_fixture
    cam = Pinhole(fx=50, fy=50, cx=31.5, cy=23.5, width=64, height=48)
    s = TUMRGBDStream(str(assoc), calib=cam, input_frame="RDF")
    frames = list(s)
    assert len(frames) == 3
    f0 = frames[0]
    assert f0.gray.shape == (48, 64)
    assert f0.gray.dtype == np.float32
    np.testing.assert_allclose(f0.depth, 1.0, atol=1e-3)  # 5000/5000
    np.testing.assert_allclose(frames[1].depth, 1.2, atol=1e-3)
    np.testing.assert_allclose(f0.quat, [1, 0, 0, 0])
    np.testing.assert_allclose(frames[2].trans, [0.2, 0, 0], atol=1e-6)


def test_tum_stream_flu_conversion(tum_fixture):
    from flame_ros_tpu.datasets.tum import TUMRGBDStream
    from flame_ros_tpu.geometry.camera import Pinhole
    d, assoc = tum_fixture
    cam = Pinhole(fx=50, fy=50, cx=31.5, cy=23.5, width=64, height=48)
    s = TUMRGBDStream(str(assoc), calib=cam, input_frame="FLU")
    f2 = list(s)[2]
    # FLU x (forward) -> RDF z.
    np.testing.assert_allclose(f2.trans, [0, 0, 0.2], atol=1e-6)


def test_tum_build_associations(tmp_path, rng):
    from flame_ros_tpu.datasets.tum import build_associations
    d = tmp_path
    (d / "rgb.txt").write_text(
        "# comment\n1.00 rgb/a.png\n2.00 rgb/b.png\n")
    (d / "groundtruth.txt").write_text(
        "1.001 0 0 0 0 0 0 1\n2.005 1 0 0 0 0 0 1\n")
    lines = build_associations(str(d))
    assert len(lines) == 2
    parts = lines[0].split()
    assert parts[9] == "rgb/a.png"


@pytest.fixture
def asl_fixture(tmp_path, rng):
    import yaml
    root = tmp_path / "mav0"
    cam0 = root / "cam0"
    pose0 = root / "state_groundtruth_estimate0"
    (cam0 / "data").mkdir(parents=True)
    pose0.mkdir(parents=True)
    T_BS_cam = np.eye(4)
    T_BS_cam[:3, 3] = [0.1, 0.0, 0.0]
    (cam0 / "sensor.yaml").write_text(yaml.dump({
        "sensor_type": "camera",
        "T_BS": {"rows": 4, "cols": 4,
                 "data": T_BS_cam.ravel().tolist()},
        "intrinsics": [50.0, 50.0, 31.5, 23.5],
        "resolution": [64, 48],
        "distortion_coefficients": [0.0, 0.0, 0.0, 0.0],
    }))
    (pose0 / "sensor.yaml").write_text(yaml.dump({
        "sensor_type": "visual-inertial",
        "T_BS": {"rows": 4, "cols": 4, "data": np.eye(4).ravel().tolist()},
    }))
    cam_rows = []
    pose_rows = []
    for i in range(3):
        ts = 1000000000 + i * 50000000
        img = rng.integers(0, 255, (48, 64), np.uint8)
        _write_png(cam0 / "data" / f"{ts}.png", img)
        cam_rows.append(f"{ts},{ts}.png")
        pose_rows.append(f"{ts},{0.05*i},0,0,1,0,0,0")
    (cam0 / "data.csv").write_text(
        "#ts,fn\n" + "\n".join(cam_rows) + "\n")
    (pose0 / "data.csv").write_text(
        "#ts,px,py,pz,qw,qx,qy,qz\n" + "\n".join(pose_rows) + "\n")
    return root


def test_asl_stream(asl_fixture):
    from flame_ros_tpu.datasets.asl import ASLRGBDStream
    s = ASLRGBDStream(str(asl_fixture / "state_groundtruth_estimate0"),
                      str(asl_fixture / "cam0"), world_frame="RDF")
    assert len(s) == 3
    frames = list(s)
    f0 = frames[0]
    assert f0.gray.shape == (48, 64)
    # Body at origin + camera 0.1 along body x => camera at (0.1, 0, 0).
    np.testing.assert_allclose(f0.trans, [0.1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(frames[2].trans, [0.2, 0, 0], atol=1e-6)
    assert s.cam.width == 64


def test_eval_confusion_matrix():
    from flame_ros_tpu.eval.metrics import truth_stats
    est = np.full((4, 4), np.nan, np.float32)
    est[0, 0] = 0.5   # tp exact
    est[0, 1] = 0.6   # tp with error 0.1
    est[1, 0] = 0.25  # fp (no gt)
    depth = np.zeros((4, 4), np.float32)
    depth[0, 0] = 2.0
    depth[0, 1] = 2.0
    depth[2, 2] = 2.0  # fn (gt, no est)
    ts = truth_stats(est, depth)
    assert ts.true_pos == 2
    assert ts.false_pos == 1
    assert ts.false_neg == 1
    assert ts.true_neg == 16 - 4
    np.testing.assert_allclose(ts.total_error, 0.1 + 0.25, atol=1e-5)
    np.testing.assert_allclose(ts.precision, 2 / 3, atol=1e-6)
    np.testing.assert_allclose(ts.recall, 2 / 3, atol=1e-6)


def test_stats_file_writer(tmp_path):
    from flame_ros_tpu.eval.metrics import (
        StatsFileWriter, truth_stats, load_stats_file, STATS_COLUMNS)
    est = np.full((4, 4), 0.5, np.float32)
    depth = np.full((4, 4), 2.0, np.float32)
    ts = truth_stats(est, depth)
    w = StatsFileWriter(str(tmp_path))
    w.append(0, 123.4, 12.5, 100, 180, ts, 1000.0, 3.2)
    w.append(1, 123.5, 11.0, 101, 181, ts, 900.0, 3.0)
    data = load_stats_file(w.path)
    assert set(data.keys()) == set(STATS_COLUMNS)
    assert data["idx"].tolist() == [0.0, 1.0]
    assert data["num_vtx"][1] == 101


def test_mav_trajectory_excites_all_dof():
    """motion='mav' (BASELINE config 3 stand-in): every translation and
    rotation axis carries real excursion, with EuRoC-V1-like magnitudes
    (aggressive roll/pitch + forward excursion + yaw)."""
    from flame_ros_tpu.datasets.synthetic import make_trajectory
    from flame_ros_tpu.geometry.se3 import SE3
    poses = make_trajectory(120, motion="mav")
    taus = np.asarray(poses.log())
    span = taus.max(axis=0) - taus.min(axis=0)
    # tx, ty, tz, pitch, yaw, roll all move.
    assert (span[:3] > 0.25).all(), f"translation spans {span[:3]}"
    assert (span[3:] > 0.2).all(), f"rotation spans {span[3:]}"
    # Inter-frame motion stays trackable (< 2 deg, < 4 cm at 120 frames).
    rel = np.asarray(SE3(poses.q[:-1], poses.t[:-1]).inverse().compose(
        SE3(poses.q[1:], poses.t[1:])).log())
    assert np.abs(rel[:, 3:]).max() < np.radians(2.0)
    assert np.linalg.norm(rel[:, :3], axis=1).max() < 0.04


def test_primitives_scene_has_depth_discontinuities():
    """scene='primitives': a second, independent generator family. GT
    depth must contain real occlusion steps (> 0.5 m jumps between
    adjacent pixels), full coverage, and per-frame photometric
    consistency (the same world point renders the same gray)."""
    from flame_ros_tpu.datasets.synthetic import make_sequence, QVGA
    seq = make_sequence(n_frames=3, cam=QVGA, scene="primitives")
    d = seq.depths[0]
    assert (d > 0).mean() > 0.99
    jumps = np.abs(np.diff(d, axis=0))
    assert jumps.max() > 0.5, "no depth discontinuities"
    assert (jumps > 0.5).sum() > 100, "too few occlusion-boundary pixels"
    # Images textured (not flat) and in range.
    assert seq.images[0].std() > 20.0
    assert seq.images[0].min() >= 0.0 and seq.images[0].max() <= 255.0

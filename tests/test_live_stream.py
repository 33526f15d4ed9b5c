import numpy as np

from flame_ros_tpu.geometry.camera import Pinhole
from flame_ros_tpu.streams.live import PoseTable, TrackedImageStream

CAM = Pinhole(fx=50, fy=50, cx=31.5, cy=23.5, width=64, height=48)


def test_pose_table_interpolation():
    pt = PoseTable()
    pt.add(1.0, [1, 0, 0, 0], [0, 0, 0])
    pt.add(2.0, [1, 0, 0, 0], [1.0, 0, 0])
    p = pt.lookup(1.5)
    np.testing.assert_allclose(np.asarray(p.t), [0.5, 0, 0], atol=1e-6)
    # Rotation nlerp: 90deg yaw at t=2.
    pt2 = PoseTable()
    pt2.add(0.0, [1, 0, 0, 0], [0, 0, 0])
    s = np.sin(np.pi / 4)
    pt2.add(1.0, [np.cos(np.pi / 4), 0, s, 0], [0, 0, 0])
    q = np.asarray(pt2.lookup(0.5).q)
    # Halfway: 45 deg about y.
    np.testing.assert_allclose(q, [np.cos(np.pi / 8), 0, np.sin(np.pi / 8), 0],
                               atol=1e-3)


def test_pose_table_out_of_range():
    pt = PoseTable()
    pt.add(1.0, [1, 0, 0, 0], [0, 0, 0])
    assert pt.lookup(0.5) is None
    assert pt.lookup(2.0) is None
    assert pt.lookup(0.99, max_extrapolation=0.05) is not None
    assert PoseTable().lookup(1.0) is None


def test_tracked_image_stream_joins_and_drops(rng):
    pt = PoseTable()
    got = []

    def sink(img_id, time, q, t, gray, depth):
        got.append((img_id, time, tuple(np.round(t, 3))))
        return True

    s = TrackedImageStream(CAM, pt, sink)
    img = rng.uniform(0, 255, (48, 64)).astype(np.float32)
    # No pose yet -> dropped.
    assert not s.image_callback(1.0, img)
    assert s.num_pose_failures == 1
    pt.add(0.9, [1, 0, 0, 0], [0, 0, 0])
    pt.add(1.1, [1, 0, 0, 0], [0.2, 0, 0])
    assert s.image_callback(1.0, img)
    assert got[0][0] == 0 and got[0][2] == (0.1, 0.0, 0.0)


def test_tracked_image_stream_rgb_and_resize(rng):
    pt = PoseTable()
    pt.add(1.0, [1, 0, 0, 0], [0, 0, 0])
    frames = []
    s = TrackedImageStream(CAM, pt,
                           lambda *a: frames.append(a) or True,
                           resize_factor=2)
    rgb = rng.uniform(0, 255, (48, 64, 3)).astype(np.float32)
    assert s.image_callback(1.0, rgb)
    gray = frames[0][4]
    assert gray.shape == (24, 32)
    assert s.cam.width == 32


def test_typed_asl_records():
    from flame_ros_tpu.datasets.asl import (IMUData, PoseData, PositionData,
                                            FileData)
    imu = IMUData.from_row(5, ["0.1", "0.2", "0.3", "9.8", "0", "0"])
    np.testing.assert_allclose(imu.gyro, [0.1, 0.2, 0.3])
    pose = PoseData.from_row(5, ["1", "2", "3", "1", "0", "0", "0"])
    np.testing.assert_allclose(pose.trans, [1, 2, 3])
    np.testing.assert_allclose(pose.quat, [1, 0, 0, 0])
    pos = PositionData.from_row(5, ["4", "5", "6"])
    np.testing.assert_allclose(pos.pos, [4, 5, 6])
    assert FileData.from_row(5, ["img.png"]).filename == "img.png"

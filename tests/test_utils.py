import threading
import time

import numpy as np

from flame_ros_tpu.streams.queue import ThreadSafeQueue
from flame_ros_tpu.utils.stats_tracker import StatsTracker, STAGE_TIMINGS
from flame_ros_tpu.utils.load_tracker import LoadTracker
from flame_ros_tpu.geometry.frames import to_rdf, world_to_rdf


def test_queue_drop_newest():
    q = ThreadSafeQueue(maxsize=3)
    assert all(q.push(i) for i in range(3))
    assert not q.push(99)  # dropped
    assert q.num_dropped == 1
    assert [q.pop() for _ in range(3)] == [0, 1, 2]
    assert q.empty()


def test_queue_blocking_pop():
    q = ThreadSafeQueue(maxsize=2)
    out = []

    def consumer():
        out.append(q.pop(timeout=2.0))

    t = threading.Thread(target=consumer)
    t.start()
    time.sleep(0.05)
    q.push("x")
    t.join()
    assert out == ["x"]


def test_queue_pop_timeout():
    q = ThreadSafeQueue()
    assert q.pop(timeout=0.01) is None


def test_stats_tracker_vocabulary():
    s = StatsTracker()
    with s.scope("update"):
        time.sleep(0.005)
    s.set("num_feats", 12)
    s.add("num_fail_max_cost", 3)
    s.add("num_fail_max_cost", 2)
    rec = s.to_record(img_id=7, timestamp=1.5)
    assert rec["img_id"] == 7
    assert rec["update_ms"] >= 4.0
    assert rec["num_feats"] == 12
    assert rec["num_fail_max_cost"] == 5
    for key in STAGE_TIMINGS:
        assert f"{key}_ms" in rec


def test_load_tracker():
    lt = LoadTracker()
    _ = sum(i * i for i in range(200000))  # burn some cpu
    snap = lt.get()
    assert snap.max_load.cpu >= 1
    assert snap.max_load.mem > 100
    assert snap.pid_load.mem > 1  # process resident MB


def test_frame_conversion_rdf_identity():
    q, t = to_rdf(np.array([1, 0, 0, 0.0]), np.array([1, 2, 3.0]), "RDF")
    np.testing.assert_allclose(q, [1, 0, 0, 0])
    np.testing.assert_allclose(t, [1, 2, 3])


def test_frame_conversion_flu():
    # FLU x-axis (forward) must map to RDF z-axis (forward).
    q, t = to_rdf(np.array([1, 0, 0, 0.0]), np.array([1.0, 0, 0]), "FLU")
    np.testing.assert_allclose(t, [0, 0, 1], atol=1e-12)
    # FLU z (up) -> RDF -y (up = -down)
    _, t2 = to_rdf(np.array([1, 0, 0, 0.0]), np.array([0, 0, 1.0]), "FLU")
    np.testing.assert_allclose(t2, [0, -1, 0], atol=1e-12)
    # Conjugated rotation stays a unit quaternion.
    assert abs(np.linalg.norm(q) - 1) < 1e-9


def test_frame_conversion_frd_rfu():
    _, t = to_rdf(np.array([1, 0, 0, 0.0]), np.array([1.0, 0, 0]), "FRD")
    np.testing.assert_allclose(t, [0, 0, 1], atol=1e-12)  # forward -> z
    _, t = world_to_rdf(np.array([1, 0, 0, 0.0]), np.array([0, 1.0, 0]), "RFU")
    np.testing.assert_allclose(t, [0, 0, 1], atol=1e-12)  # forward -> z

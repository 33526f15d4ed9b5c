import socket
import time

import numpy as np

from flame_ros_tpu.config import FlameParams
from flame_ros_tpu.datasets.synthetic import make_sequence, QVGA
from flame_ros_tpu.frontends.serve import FlameServer, send_msg, recv_msg


def _params():
    return FlameParams.from_dict({
        "engine": {"max_features": 256, "max_keyframes": 2,
                   "pd_iters_per_frame": 5}})


def test_serve_stream_roundtrip():
    """Full network loop: stream posed frames over TCP, receive telemetry,
    fetch the mesh and dense idepth products."""
    seq = make_sequence(n_frames=8, cam=QVGA)
    srv = FlameServer(QVGA, _params(), port=0)
    srv.start()
    try:
        c = socket.create_connection(("127.0.0.1", srv.port), timeout=10)
        c.settimeout(60)
        for i in range(8):
            img = np.clip(seq.images[i], 0, 255).astype(np.uint8)
            send_msg(c, {"type": "frame", "img_id": i,
                         "time": float(seq.timestamps[i]),
                         "quat": np.asarray(seq.poses.q[i]).tolist(),
                         "trans": np.asarray(seq.poses.t[i]).tolist(),
                         "shape": list(img.shape), "dtype": "uint8"},
                     img.tobytes())
        # Collect stats messages for all 8 frames.
        stats = []
        while len(stats) < 8:
            h, _ = recv_msg(c)
            assert h is not None, "server closed early"
            if h["type"] == "stats":
                stats.append(h)
        assert stats[-1]["num_feats"] > 50
        assert stats[-1]["img_id"] == 7

        send_msg(c, {"type": "get_idepth"})
        while True:
            h, payload = recv_msg(c)
            if h["type"] == "idepth":
                break
        m = np.frombuffer(payload, np.float32).reshape(h["shape"])
        assert m.shape == (240, 320)
        assert np.isfinite(m).mean() > 0.2

        send_msg(c, {"type": "get_mesh"})
        while True:
            h, payload = recv_msg(c)
            if h["type"] == "mesh":
                break
        import io
        mesh = np.load(io.BytesIO(payload))
        assert mesh["triangles"].shape[1] == 3
        assert len(mesh["idepths"]) > 50

        send_msg(c, {"type": "stop"})
        c.close()
    finally:
        srv.stop()


def test_python_dash_m_entrypoints_exist():
    """`python -m flame_ros_tpu.frontends.serve` (what demo_live.sh
    runs) must actually invoke main(): the module shipped without an
    `if __name__ == "__main__"` guard for a round, so the demo's server
    imported and exited silently (round-5 verify drive). --help must
    print usage and exit 0 for every `python -m`-documented CLI."""
    import subprocess
    import sys

    for mod in ("flame_ros_tpu.frontends.serve",
                "flame_ros_tpu.frontends.offline_runner",
                "flame_ros_tpu.viz.live_viewer"):
        r = subprocess.run(
            [sys.executable, "-m", mod, "--help"],
            capture_output=True, text=True, timeout=120)
        assert r.returncode == 0, (mod, r.stderr[-500:])
        assert "usage" in r.stdout.lower(), (mod, r.stdout[:200])

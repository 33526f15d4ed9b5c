"""Live streaming viewer (VERDICT r4 missing #3): a running system's
mesh must be watchable in a continuously updating page — the reference
demo's UX (rviz TexturedMeshDisplay consuming the mesh topic,
textured_mesh_display.cc:389-503)."""
import json
import time
import urllib.request

import numpy as np

from flame_ros_tpu.config import FlameParams
from flame_ros_tpu.datasets.synthetic import QVGA, make_sequence
from flame_ros_tpu.frontends.serve import FlameServer, send_msg
from flame_ros_tpu.viz.live_viewer import LiveMeshViewer


def _params():
    return FlameParams.from_dict({
        "engine": {"max_features": 256, "max_keyframes": 2,
                   "pd_iters_per_frame": 5}})


def _get(url, timeout=5.0):
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return r.status, r.read()


def test_server_concurrent_clients_and_disconnect_resilience():
    """The live-viewer architecture REQUIRES two concurrent server
    clients (frame streamer + mesh poller), and a client dropping
    mid-conversation must never take the accept loop down (round-5
    review: listen(1) + sequential serving deadlocked the demo when the
    poller connected first; an unhandled BrokenPipeError then killed
    the accept thread)."""
    import socket

    from flame_ros_tpu.frontends.serve import recv_msg

    seq = make_sequence(n_frames=6, cam=QVGA)
    srv = FlameServer(seq.cam, _params(), port=0)
    srv.start()
    try:
        # Client A connects FIRST and just sits on the connection (the
        # poller-wins-the-race scenario). Client B must still be served.
        a = socket.create_connection(("127.0.0.1", srv.port), timeout=5)
        b = socket.create_connection(("127.0.0.1", srv.port), timeout=5)
        b.settimeout(20.0)
        send_msg(b, {"type": "get_idepth"})
        header, payload = recv_msg(b)
        assert header is not None and header["type"] == "idepth"
        # A drops abruptly (no "stop") — possibly mid-reply.
        send_msg(a, {"type": "get_idepth"})
        a.close()
        time.sleep(0.3)
        # The server must still accept and serve NEW clients.
        c = socket.create_connection(("127.0.0.1", srv.port), timeout=5)
        c.settimeout(20.0)
        send_msg(c, {"type": "get_idepth"})
        header, payload = recv_msg(c)
        assert header is not None and header["type"] == "idepth"
        # ... and the earlier concurrent client still works too.
        send_msg(b, {"type": "get_idepth"})
        header, _ = recv_msg(b)
        assert header is not None and header["type"] == "idepth"
        for s in (b, c):
            try:
                send_msg(s, {"type": "stop"})
                s.close()
            except OSError:
                pass
    finally:
        srv.stop()


def test_live_viewer_streams_growing_mesh():
    seq = make_sequence(n_frames=10, cam=QVGA)
    srv = FlameServer(seq.cam, _params(), port=0)
    srv.start()
    viewer = LiveMeshViewer(server_port=srv.port, http_port=0,
                            period_s=0.2).start()
    import socket

    c = socket.create_connection(("127.0.0.1", srv.port))
    try:
        base = f"http://127.0.0.1:{viewer.http_port}"
        # Page serves immediately, with the polling loop baked in.
        status, page = _get(base + "/")
        assert status == 200
        assert b"mesh.json" in page and b"setMesh" in page

        for i in range(8):
            img = np.clip(seq.images[i], 0, 255).astype(np.uint8)
            send_msg(c, {"type": "frame", "img_id": i,
                         "time": float(seq.timestamps[i]),
                         "quat": np.asarray(seq.poses.q[i]).tolist(),
                         "trans": np.asarray(seq.poses.t[i]).tolist(),
                         "shape": [seq.cam.height, seq.cam.width],
                         "dtype": "uint8"}, img.tobytes())
        # Wait for the engine to process + the poller to pick up a mesh.
        deadline = time.time() + 30
        d = None
        while time.time() < deadline:
            with urllib.request.urlopen(base + "/mesh.json",
                                        timeout=5) as r:
                if r.status == 200:
                    d = json.loads(r.read())
                    if len(d["xyz"]) >= 9 and len(d["tris"]) >= 3:
                        break
            time.sleep(0.3)
        assert d is not None and len(d["xyz"]) >= 9, d and len(d["xyz"])
        assert d["stamp"] >= 1
        assert np.isfinite(np.asarray(d["xyz"])).all()
    finally:
        try:
            send_msg(c, {"type": "stop"})
            c.close()
        except OSError:
            pass
        viewer.stop()
        srv.stop()

"""Network streaming server: posed frames in, depth products out.

Replaces the reference's ROS pub/sub transport surface (SURVEY §2.10: all
I/O is ROS messages) with a dependency-free TCP protocol so any process
can stream frames to the engine and receive telemetry/mesh products:

    message   := u32_le length | JSON header | raw payload (header.nbytes)
    client -> {"type": "frame", "img_id", "time", "quat", "trans",
               "shape": [H, W], "dtype": "uint8", "nbytes": H*W}
              {"type": "poseframes", "ids": [...], "poses": [[q4 t3]...]}
              {"type": "get_mesh"} | {"type": "get_idepth"} | {"type": "stop"}
    server -> per processed frame: {"type": "stats", ...telemetry...}
              for get_mesh: header + NPZ payload
              for get_idepth: header + float32 payload

Ctor mirrors the nodelet (it wraps one): camera intrinsics + FlameParams;
`pose_source="tracking"` serves without client-supplied poses.
"""
from __future__ import annotations

import json
import socket
import struct
import threading
from typing import Optional

import numpy as np

from flame_ros_tpu.config import FlameParams
from flame_ros_tpu.geometry.camera import Pinhole
from flame_ros_tpu.frontends.nodelet import FlameNodelet


def send_msg(sock: socket.socket, header: dict, payload: bytes = b""):
    header = dict(header)
    if payload:
        header["nbytes"] = len(payload)
    blob = json.dumps(header).encode()
    sock.sendall(struct.pack("<I", len(blob)) + blob + payload)


def recv_msg(sock: socket.socket):
    raw = _recv_exact(sock, 4)
    if raw is None:
        return None, b""
    (n,) = struct.unpack("<I", raw)
    blob = _recv_exact(sock, n)
    if blob is None:
        return None, b""
    header = json.loads(blob)
    payload = b""
    if header.get("nbytes"):
        payload = _recv_exact(sock, header["nbytes"]) or b""
    return header, payload


def _recv_exact(sock, n):
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            return None
        buf += chunk
    return buf


class FlameServer:
    def __init__(self, cam: Pinhole, params: Optional[FlameParams] = None,
                 host: str = "127.0.0.1", port: int = 0,
                 pose_source: str = "external"):
        self.node = FlameNodelet(cam, params, pose_source=pose_source)
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind((host, port))
        self._srv.listen(8)
        self.port = self._srv.getsockname()[1]
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        # Serializes engine product reads (get_mesh/get_idepth) across
        # concurrent client connections.
        self._products_lock = threading.Lock()

    def start(self, warmup: bool = True):
        if warmup:
            self._warmup()
        self.node.start()
        self._thread = threading.Thread(target=self._accept_loop,
                                        daemon=True)
        self._thread.start()

    def _warmup(self):
        """Compile the engine executables BEFORE serving frames. The
        first update otherwise stalls tens of seconds (cold jit) while
        a live client's frames overflow the nodelet's drop-newest
        queue — a short streamed sequence can lose every frame to the
        warmup window. Deferring the accept loop instead gives TCP
        backpressure: early clients sit in the listen backlog and
        nothing drops. A THROWAWAY engine with identical (cam, params)
        shares the module-level jit caches (engine steps are
        module-level jits keyed on static cam/params), so the product
        engine's state is untouched."""
        from flame_ros_tpu.geometry.se3 import SE3
        from flame_ros_tpu.models.engine import Flame

        cam = self.node.cam
        eng = Flame(cam.width, cam.height, cam=cam,
                    params=self.node.params)
        # A textured (non-constant) image keeps every detection /
        # gradient path honest; content is irrelevant for compilation.
        yy, xx = np.mgrid[:cam.height, :cam.width]
        img = ((xx * 13 + yy * 7) % 251).astype(np.float32)
        pose = SE3.identity()
        eng.update(0.0, 0, pose, img, is_poseframe=True)   # pf variant
        eng.update(1 / 30.0, 1, pose, img, is_poseframe=False)
        eng.shutdown()

    def stop(self):
        self._stop.set()
        self.node.stop()
        try:
            self._srv.close()
        except OSError:
            pass

    def _accept_loop(self):
        # One thread per connection: the live-viewer UX needs (at least)
        # two concurrent clients — a frame streamer and a mesh poller —
        # and a client dropping mid-reply must never take the server
        # down with it (each connection's errors stay in its own
        # thread; see _run_conn).
        while not self._stop.is_set():
            try:
                conn, _ = self._srv.accept()
            except OSError:
                return
            threading.Thread(target=self._run_conn, args=(conn,),
                             daemon=True).start()

    def _run_conn(self, conn: socket.socket):
        try:
            self._serve_conn(conn)
        except (OSError, ValueError, KeyError, json.JSONDecodeError):
            # A malformed message or a mid-send disconnect
            # (BrokenPipeError/ConnectionResetError are OSErrors) ends
            # THIS connection only; the accept loop keeps serving.
            pass
        finally:
            try:
                conn.close()
            except OSError:
                pass

    def _serve_conn(self, conn: socket.socket):
        lock = threading.Lock()

        def on_stats(rec):
            try:
                with lock:
                    send_msg(conn, {"type": "stats", **{
                        k: (float(v) if isinstance(v, (int, float, np.floating))
                            else v) for k, v in rec.items()
                        if not isinstance(v, (np.ndarray,))}})
            except OSError:
                pass

        self.node.on_stats.append(on_stats)
        try:
            while not self._stop.is_set():
                header, payload = recv_msg(conn)
                if header is None or header.get("type") == "stop":
                    return
                t = header["type"]
                if t == "frame":
                    img = np.frombuffer(
                        payload, dtype=header.get("dtype", "uint8")
                    ).reshape(header["shape"]).astype(np.float32)
                    self.node.push_frame(
                        header["img_id"], header["time"],
                        header.get("quat"), header.get("trans"), img)
                elif t == "poseframes":
                    import jax.numpy as jnp

                    from flame_ros_tpu.geometry.se3 import SE3
                    poses = np.asarray(header["poses"], np.float32)
                    self.node.poseframe_callback(
                        header["ids"],
                        SE3(jnp.asarray(poses[:, :4]),
                            jnp.asarray(poses[:, 4:7])))
                elif t == "get_mesh":
                    import io
                    with self._products_lock:
                        uv, x, normals, tris, keep, edges = \
                            self.node.engine.get_inverse_depth_mesh()
                    buf = io.BytesIO()
                    # K rides along so a remote viewer can backproject
                    # without out-of-band calibration (viz/live_viewer).
                    np.savez(buf, vertices_px=uv, idepths=x,
                             normals=normals, triangles=tris,
                             tri_validity=keep, edges=edges,
                             K=self.node.cam.K)
                    with lock:
                        send_msg(conn, {"type": "mesh"}, buf.getvalue())
                elif t == "get_idepth":
                    with self._products_lock:
                        m = self.node.engine.get_inverse_depth_map()
                    m = (m if m is not None
                         else np.full((self.node.cam.height,
                                       self.node.cam.width), np.nan,
                                      np.float32))
                    with lock:
                        send_msg(conn, {"type": "idepth",
                                        "shape": list(m.shape)},
                                 np.ascontiguousarray(m, np.float32)
                                 .tobytes())
        finally:
            self.node.on_stats.remove(on_stats)


def main(argv=None):
    import argparse

    # CLI entry: honor the caller's JAX_PLATFORMS (see utils/platform.py).
    from flame_ros_tpu.utils.platform import pin_requested_platform
    pin_requested_platform()

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=7447)
    p.add_argument("--fx", type=float, required=True)
    p.add_argument("--fy", type=float, required=True)
    p.add_argument("--cx", type=float, required=True)
    p.add_argument("--cy", type=float, required=True)
    p.add_argument("--width", type=int, required=True)
    p.add_argument("--height", type=int, required=True)
    p.add_argument("--config")
    p.add_argument("--pose-source", default="external",
                   choices=["external", "tracking"])
    p.add_argument("--no-warmup", action="store_true",
                   help="skip the pre-serve compile warmup (frames "
                        "arriving during the first jit then drop)")
    args = p.parse_args(argv)
    cam = Pinhole(args.fx, args.fy, args.cx, args.cy, args.width,
                  args.height)
    params = (FlameParams.from_yaml(args.config) if args.config
              else FlameParams())
    srv = FlameServer(cam, params, host=args.host, port=args.port,
                      pose_source=args.pose_source)
    srv.start(warmup=not args.no_warmup)
    print(f"flame-serve listening on {args.host}:{srv.port}")
    try:
        threading.Event().wait()
    except KeyboardInterrupt:
        srv.stop()


if __name__ == "__main__":   # `python -m flame_ros_tpu.frontends.serve`
    main()

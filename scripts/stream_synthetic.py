"""Stream a synthetic posed sequence into a running FlameServer over
its TCP protocol — the demo feeder for the live viewer (scripts/
demo_live.sh). Zero-egress friendly: no dataset download."""
import argparse
import socket
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from flame_ros_tpu.datasets.synthetic import QVGA, VGA, make_sequence
from flame_ros_tpu.frontends.serve import send_msg


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=7447)
    p.add_argument("--frames", type=int, default=200)
    p.add_argument("--rate", type=float, default=10.0,
                   help="frames/s to stream (0 = as fast as possible)")
    p.add_argument("--resolution", default="qvga",
                   choices=["qvga", "vga"])
    args = p.parse_args(argv)
    cam = VGA if args.resolution == "vga" else QVGA
    seq = make_sequence(n_frames=args.frames, cam=cam)
    c = socket.create_connection((args.host, args.port))
    try:
        for i in range(args.frames):
            img = np.clip(seq.images[i], 0, 255).astype(np.uint8)
            send_msg(c, {"type": "frame", "img_id": i,
                         "time": float(seq.timestamps[i]),
                         "quat": np.asarray(seq.poses.q[i]).tolist(),
                         "trans": np.asarray(seq.poses.t[i]).tolist(),
                         "shape": [cam.height, cam.width],
                         "dtype": "uint8"}, img.tobytes())
            if args.rate > 0:
                time.sleep(1.0 / args.rate)
        print(f"streamed {args.frames} frames")
    finally:
        send_msg(c, {"type": "stop"})
        c.close()


if __name__ == "__main__":
    main()

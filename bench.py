"""Benchmark: sustained engine throughput (frames/s/chip) at VGA.

Runs the full FLaME engine loop — epipolar depth filtering, poseframe
detection + host Delaunay, NLTGV2-L1 smoothing, dense rasterization — over
a synthetic posed VGA sequence on the available accelerator, and prints ONE
JSON line. vs_baseline is against the reference's implied real-time target
of 30 fps at VGA on CPU (reference README.md:217-218 and the offline
throttle rate: 30, cfg/flame_offline_tum.yaml; BASELINE.md).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax

    from flame_ros_tpu.config import FlameParams
    from flame_ros_tpu.datasets.synthetic import make_sequence, VGA
    from flame_ros_tpu.geometry.se3 import SE3
    from flame_ros_tpu.models.engine import Flame

    n_render = 30
    seq = make_sequence(n_frames=n_render, cam=VGA, motion="strafe")
    images_u8 = [np.clip(im, 0, 255).astype(np.uint8) for im in seq.images]
    # Prefer the hand-scheduled Pallas rasterizer on TPU; fall back to the
    # XLA formulation if the kernel fails to compile on this backend.
    try:
        params = FlameParams.from_dict(
            {"engine": {"use_pallas_raster": True}})
        engine = Flame(VGA.width, VGA.height, cam=VGA, params=params)
        engine.update(0.0, 0, SE3(seq.poses.q[0], seq.poses.t[0]),
                      images_u8[0], True)
        np.asarray(engine.state.vtx_x[:1])
    except Exception:
        params = FlameParams()
    engine = Flame(VGA.width, VGA.height, cam=VGA, params=params,
                   deferred_triangulation=True)

    def frame(i):
        j = i % n_render
        return (seq.timestamps[j] + (i // n_render), i,
                SE3(seq.poses.q[j], seq.poses.t[j]), images_u8[j])

    # Window batching: a poseframe-aligned window ships in ONE packed H2D
    # and runs as ONE device dispatch, amortizing transfer latency over
    # the link. Measure both window sizes and report the sustained best
    # (link/relay characteristics vary).
    def run_mode(win_size, n_timed, prefetch=False):
        def window(start):
            out = []
            for i in range(start, start + win_size):
                t, fid, pose, img = frame(i)
                out.append((t, fid, pose, img, i % 6 == 0))
            return out

        # NOTE: force completion by pulling real data — on tunneled PJRT
        # backends block_until_ready can be a no-op.
        warmup = 2 * 6
        starts = list(range(0, warmup + n_timed, win_size))
        n_warm_w = warmup // win_size
        if prefetch:
            # Double-buffered H2D: window w+1 uploads on a background
            # thread while window w computes (engine.prefetch_window).
            pre = engine.prefetch_window(window(starts[0]))
            t0 = None
            for k, w in enumerate(starts):
                if k == n_warm_w:
                    np.asarray(engine.state.vtx_x[:1])
                    t0 = time.perf_counter()
                nxt = (engine.prefetch_window(window(starts[k + 1]))
                       if k + 1 < len(starts) else None)
                engine.update_window(prefetched=pre)
                pre = nxt
        else:
            t0 = None
            for k, w in enumerate(starts):
                if k == n_warm_w:
                    np.asarray(engine.state.vtx_x[:1])
                    t0 = time.perf_counter()
                engine.update_window(window(w))
        np.asarray(engine.state.vtx_x[:1])
        return n_timed / (time.perf_counter() - t0)

    results = {}
    for key, win_size, prefetch in (("6p", 6, True), ("6", 6, False),
                                    ("1", 1, False)):
        try:
            results[key] = run_mode(win_size, 60, prefetch)
        except Exception:
            engine._prefetch_issued.clear()  # abandon half-issued uploads
    best_win, fps = max(results.items(), key=lambda kv: kv[1])
    print(json.dumps({
        "metric": "engine_fps_vga",
        "value": round(fps, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / 30.0, 3),
        "window": best_win,
        "all": {str(k): round(v, 2) for k, v in results.items()},
    }))


if __name__ == "__main__":
    main()

"""2-process end-to-end MultiStreamRunner bench row (SCALING_rN).

Spawns the same 2-worker jax.distributed setup as
tests/test_distributed.py::test_two_process_end_to_end_runner with
--bench, aggregates the per-process DIST_E2E_FPS lines, and prints one
JSON row. The comparable single-process number is bench_scaling.py's
e2e_full_fps_s2 (same algorithm, same per-stream work, no process
boundary).
"""
import json
import os
import re
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    procs = [subprocess.Popen(
        [sys.executable, "-m", "flame_ros_tpu.parallel.dist_e2e",
         str(pid), "2", str(port), "13", "--bench"],
        cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for pid in range(2)]
    outs = [p.communicate(timeout=540)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            print(json.dumps({"metric": "e2e_full_fps_2proc",
                              "error": out[-500:]}))
            return
    fps = [float(re.search(r"DIST_E2E_FPS pid=\d+ fps=([\d.]+)", out)
                 .group(1)) for out in outs]
    # Each process reports the same global aggregate (updates are
    # collective); record the mean of the two observations.
    fps2p = sum(fps) / len(fps)
    print(json.dumps({
        "metric": "e2e_full_fps_2proc",
        "value": round(fps2p, 2),
        "unit": "frames/s aggregate (full algorithm, 2 processes x "
                "1 stream, jax.distributed)",
        "per_process": [round(f, 2) for f in fps],
    }), flush=True)

    # Apples-to-apples baseline: the IDENTICAL config and loop, both
    # streams in ONE process on 2 virtual devices (--single).
    env1 = dict(env)
    env1["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    p1 = subprocess.Popen(
        [sys.executable, "-m", "flame_ros_tpu.parallel.dist_e2e",
         "0", "2", "0", "13", "--bench", "--single"],
        cwd=REPO, env=env1, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True)
    out1 = p1.communicate(timeout=540)[0]
    if p1.returncode != 0:
        print(json.dumps({"metric": "e2e_full_fps_1proc_baseline",
                          "error": out1[-500:]}))
        return
    fps1p = float(re.search(r"DIST_E2E_FPS pid=0 fps=([\d.]+)", out1)
                  .group(1))
    print(json.dumps({
        "metric": "e2e_full_fps_1proc_baseline",
        "value": round(fps1p, 2),
        "unit": "frames/s aggregate (same config/loop, 1 process x "
                "2 streams)",
    }), flush=True)
    print(json.dumps({
        "metric": "cross_process_efficiency",
        "value": round(fps2p / fps1p, 3),
        "unit": "ratio (2-process / 1-process, identical work)",
    }), flush=True)


if __name__ == "__main__":
    main()

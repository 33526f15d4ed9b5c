"""Multi-process end-to-end MultiStreamRunner bench rows (SCALING_rN).

For each process count N in BENCH_DIST_PROCS (default "2,4"): spawns
the same N-worker jax.distributed setup as
tests/test_distributed.py::test_two_process_end_to_end_runner with
--bench (one stream + one virtual device per process), aggregates the
per-process DIST_E2E_FPS lines, runs the apples-to-apples 1-process
baseline (same config/loop, N streams on N virtual devices, --single),
and prints JSON rows. The 4-process row exercises the multi-controller
path beyond 2 processes (VERDICT r4 item 6).
"""
import json
import os
import re
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _env(local_devices: int) -> dict:
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (f"--xla_force_host_platform_device_count="
                        f"{local_devices}")
    return env


def run_config(nproc: int) -> None:
    port = _free_port()
    procs = [subprocess.Popen(
        [sys.executable, "-m", "flame_ros_tpu.parallel.dist_e2e",
         str(pid), str(nproc), str(port), "13", "--bench"],
        cwd=REPO, env=_env(1), stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for pid in range(nproc)]
    outs = [p.communicate(timeout=540)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            print(json.dumps({"metric": f"e2e_full_fps_{nproc}proc",
                              "error": out[-500:]}))
            return
    fps = [float(re.search(r"DIST_E2E_FPS pid=\d+ fps=([\d.]+)", out)
                 .group(1)) for out in outs]
    # Each process reports the same global aggregate (updates are
    # collective); record the mean of the observations.
    fps_np = sum(fps) / len(fps)
    print(json.dumps({
        "metric": f"e2e_full_fps_{nproc}proc",
        "value": round(fps_np, 2),
        "unit": f"frames/s aggregate (full algorithm, {nproc} "
                "processes x 1 stream, jax.distributed)",
        "per_process": [round(f, 2) for f in fps],
    }), flush=True)

    # Apples-to-apples baseline: the IDENTICAL config and loop, all
    # streams in ONE process on nproc virtual devices (--single).
    p1 = subprocess.Popen(
        [sys.executable, "-m", "flame_ros_tpu.parallel.dist_e2e",
         "0", str(nproc), "0", "13", "--bench", "--single"],
        cwd=REPO, env=_env(nproc), stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True)
    out1 = p1.communicate(timeout=540)[0]
    if p1.returncode != 0:
        print(json.dumps(
            {"metric": f"e2e_full_fps_1proc_baseline_s{nproc}",
             "error": out1[-500:]}))
        return
    fps1p = float(re.search(r"DIST_E2E_FPS pid=0 fps=([\d.]+)", out1)
                  .group(1))
    print(json.dumps({
        "metric": f"e2e_full_fps_1proc_baseline_s{nproc}",
        "value": round(fps1p, 2),
        "unit": f"frames/s aggregate (same config/loop, 1 process x "
                f"{nproc} streams)",
    }), flush=True)
    print(json.dumps({
        "metric": f"cross_process_efficiency_{nproc}proc",
        "value": round(fps_np / fps1p, 3),
        "unit": f"ratio ({nproc}-process / 1-process, identical work)",
    }), flush=True)


def main():
    for nproc in (int(x) for x in
                  os.environ.get("BENCH_DIST_PROCS", "2,4").split(",")):
        run_config(nproc)


if __name__ == "__main__":
    main()

"""Multi-process (multi-host analog) correctness test.

Spawns 2 worker processes that form one jax.distributed CPU mesh (4
local devices each, 8 global) whose "feat" axis pairs devices across the
process boundary, and runs the full multi-stream engine step with
cross-process collectives (SURVEY §5.8 / §4: multiprocess-on-CPU stands
in for multi-host TPU)."""
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(module: str, marker: str, local_devices: int,
                 extra=()):
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = REPO  # repo only — drops any remote-TPU plugin
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (f"--xla_force_host_platform_device_count="
                        f"{local_devices}")
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", module, str(pid), "2", str(port),
             *extra],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"{marker} pid={pid}" in out, out[-3000:]
    return outs


def test_two_process_mesh_runs_engine_step():
    _run_workers("flame_ros_tpu.parallel.dist_smoke", "DIST_OK", 4)


def test_two_process_end_to_end_runner():
    """Full MultiStreamRunner across 2 processes for 3 poseframe
    periods (VERDICT r2 item 2): per-process D2H of local stream
    shards -> per-process host Delaunay -> cross-process topology
    install, repeated, with per-stream GT accuracy checked in each
    process (see parallel/dist_e2e.py)."""
    outs = _run_workers("flame_ros_tpu.parallel.dist_e2e",
                        "DIST_E2E_OK", 1, extra=("13",))
    for out in outs:
        assert "pf_rounds=3" in out, out[-2000:]


def test_two_process_spatial_partition_runner():
    """Multi-host + spatial partitioning at once (SURVEY §5.8 complete):
    2 processes x 2 local part-devices each — the NLTGV2 sweep runs
    halo-exchange sharded inside each process's part group while the
    per-process Delaunay + partition builds install across the process
    boundary (the multi-controller make_array_from_callback path)."""
    outs = _run_workers("flame_ros_tpu.parallel.dist_e2e",
                        "DIST_E2E_SPATIAL_OK", 2,
                        extra=("13", "--spatial"))
    for out in outs:
        assert "pf_rounds=3" in out, out[-2000:]

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


def _metrics_line(out: str, marker: str = "DIST_E2E_OK") -> str:
    for line in out.splitlines():
        if line.startswith(marker):
            # cov=... med_err=... tris=... — the deterministic payload.
            return line.split("frames=", 1)[1]
    raise AssertionError(f"no {marker} line:\n{out[-2000:]}")


def test_two_process_kill_and_restart_from_checkpoint(tmp_path):
    """Elastic recovery for the multi-controller pod path (SURVEY §5.4
    "multi-host pod runs make restart expensive"; VERDICT r4 missing
    #2). Three phases:

    A. Uninterrupted 2-process reference run that also writes a
       per-process sharded checkpoint at frame 7 (runner
       save_checkpoint — each host serializes only its addressable
       stream rows).
    B. Failure injection: the same run paused after the checkpoint is
       durably on disk; the harness SIGKILLs worker 1 mid-run — the
       job dies (a dead peer is fatal to a jax.distributed pod; there
       is no single-worker survival story, by design).
    C. Restart: a FRESH 2-process pod reloads the phase-B checkpoint
       (each process its own shard file) and replays the remaining
       schedule — its final per-stream metrics must equal phase A's
       exactly (deterministic resume).
    """
    import time

    ck_a = str(tmp_path / "pod_a")
    outs_a = _run_workers(
        "flame_ros_tpu.parallel.dist_e2e", "DIST_E2E_OK", 1,
        extra=("13", f"--ckpt={ck_a}", "--ckpt-at=7"))
    ref = [_metrics_line(o) for o in outs_a]

    # Phase B: pause after saving so the kill lands deterministically
    # mid-run, after the checkpoint exists.
    ck_b = str(tmp_path / "pod_b")
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "flame_ros_tpu.parallel.dist_e2e",
             str(pid), "2", str(port), "13", f"--ckpt={ck_b}",
             "--ckpt-at=7", "--pause-after-save=45"],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for pid in range(2)
    ]
    try:
        shard_files = [f"{ck_b}.p0.npz", f"{ck_b}.p1.npz"]
        deadline = time.time() + 300
        while time.time() < deadline:
            if all(os.path.exists(f) for f in shard_files):
                break
            if any(p.poll() is not None for p in procs):
                raise AssertionError("worker exited before checkpoint")
            time.sleep(0.5)
        assert all(os.path.exists(f) for f in shard_files)
        procs[1].kill()                      # exact PID, never a pattern
        procs[1].wait(timeout=30)
        assert procs[1].returncode != 0
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()                     # worker 0: job is dead too
                p.wait(timeout=30)

    # Phase C: fresh pod restarts from the phase-B checkpoint.
    outs_c = _run_workers(
        "flame_ros_tpu.parallel.dist_e2e", "DIST_E2E_OK", 1,
        extra=("13", f"--ckpt={ck_b}", "--ckpt-at=7", "--ckpt-load"))
    for out in outs_c:
        assert "CKPT_LOADED" in out, out[-2000:]
    got = [_metrics_line(o) for o in outs_c]
    assert got == ref, (got, ref)

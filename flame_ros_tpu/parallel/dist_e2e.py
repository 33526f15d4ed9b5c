"""Multi-process END-TO-END worker: the full MultiStreamRunner loop —
poseframe detection, per-process D2H of local stream shards, per-process
host Delaunay, packed topology install, NLTGV2 smoothing, raster —
across a jax.distributed process boundary (VERDICT r2 item 2; the CPU
multi-controller analog of a multi-host TPU pod where each host feeds
and triangulates its own camera streams).

Unlike parallel/dist_smoke.py (one batched_frame_step), this drives
MultiStreamRunner through >= 3 poseframe periods, so the cross-process
run exercises the complete host<->device topology round-trip several
times, then checks per-stream accuracy against GT.

Launched by tests/test_distributed.py / bench_scaling.py:

    python -m flame_ros_tpu.parallel.dist_e2e <pid> <nproc> <port> \
        [n_frames] [--bench]

Each worker needs JAX_PLATFORMS=cpu,
XLA_FLAGS=--xla_force_host_platform_device_count=<local>, and no
remote-TPU plugin on PYTHONPATH.
"""
from __future__ import annotations

import sys
import time


def main(pid: int, nproc: int, port: int, n_frames: int = 13,
         bench: bool = False, single: bool = False,
         spatial: bool = False, ckpt: str = "", ckpt_at: int = 0,
         ckpt_load: bool = False, pause_after_save: float = 0.0) -> None:
    import jax
    if not single:
        jax.distributed.initialize(f"127.0.0.1:{port}", nproc, pid)
    import numpy as np
    from jax.sharding import Mesh

    from flame_ros_tpu.config import FlameParams
    from flame_ros_tpu.datasets.synthetic import make_sequence, QVGA
    from flame_ros_tpu.geometry.se3 import SE3
    from flame_ros_tpu.parallel import multi_stream as ms

    if single:
        # Apples-to-apples baseline for the cross-process bench: the
        # SAME config and loop, nproc streams on nproc virtual devices
        # in ONE process (launcher sets the host device count).
        devs = jax.devices()[:nproc]
        assert len(devs) == nproc, (len(devs), nproc)
        mesh = Mesh(np.asarray(devs).reshape(nproc, 1),
                    ("stream", "feat"))
    elif spatial:
        # Multi-host + spatial partitioning at once: each process owns
        # one stream ROW of 2 local part-devices — the NLTGV2 halo
        # ppermutes stay host-local (ICI-analog) while the topology
        # install crosses the process boundary (SURVEY §5.8 in full).
        by_proc: dict = {}
        for d in jax.devices():
            by_proc.setdefault(d.process_index, []).append(d)
        rows = [by_proc[p][:2] for p in sorted(by_proc)]
        assert len(rows) == nproc and all(len(r) == 2 for r in rows)
        mesh = Mesh(np.asarray(rows), ("stream", "part"))
    else:
        # One device per process on the stream axis: each process owns
        # one stream end-to-end (ingest, triangulation, products), all
        # engine dispatches are one global pjit.
        by_proc = {}
        for d in jax.devices():
            by_proc.setdefault(d.process_index, d)
        devs = [by_proc[p] for p in sorted(by_proc)]
        assert len(devs) == nproc, (len(devs), nproc)
        mesh = Mesh(np.asarray(devs).reshape(nproc, 1),
                    ("stream", "feat"))

    params = FlameParams.from_dict({
        "engine": {"max_features": 512, "max_keyframes": 4,
                   "pd_iters_per_frame": 30,
                   **({"spatial_parts": 2} if spatial else {})},
        "input": {"poseframe_subsample_factor": 6},
    })
    seq = make_sequence(n_frames=14, cam=QVGA, motion="strafe")
    # deferred=True exercises the DETERMINISTIC multi-controller install
    # path (counter-gated blocking installs — per-process done() polling
    # would diverge the collective order across processes).
    runner = ms.MultiStreamRunner(QVGA, nproc, params=params, mesh=mesh,
                                  deferred_triangulation=True)
    assert runner.multiprocess == (not single)
    # Same install policy in both modes, so the cross-process bench
    # ratio isolates the process boundary (not a policy difference).
    runner.blocking_installs = True

    def frame(i):
        return (seq.timestamps[i], i,
                SE3(np.asarray(seq.poses.q[i]), np.asarray(seq.poses.t[i])),
                seq.images[i])

    # Stream s runs s frames behind -> genuinely different per-host state.
    start = 0
    if ckpt and ckpt_load:
        # Elastic restart (SURVEY §5.4): every process reloads its OWN
        # shard file and the pod resumes the same global frame schedule
        # from the checkpoint frame.
        runner.load_checkpoint(ckpt)
        start = ckpt_at
        print(f"CKPT_LOADED pid={pid} at={ckpt_at}", flush=True)
    for i in range(start, n_frames - 1):
        runner.update([frame(max(i - s, 0)) for s in range(nproc)])
        if ckpt and not ckpt_load and i + 1 == ckpt_at:
            runner.save_checkpoint(ckpt)
            print(f"CKPT_SAVED pid={pid} at={ckpt_at}", flush=True)
            if pause_after_save > 0:
                # Deterministic kill window for the failure-injection
                # test: the job idles here so the harness can SIGKILL a
                # worker after the checkpoint is durably on disk.
                time.sleep(pause_after_save)
    # Drain BEFORE the last update so the checked raster runs over the
    # installed topology (single mode enqueues async: without a sync the
    # deferred jobs land only after the loop). Deterministic in both
    # modes — multi-controller pending is empty here anyway (installs
    # happen inside update()).
    runner.drain_topologies()
    runner.update([frame(max(n_frames - 1 - s, 0)) for s in range(nproc)])

    local = runner.local_streams()
    if single:
        assert local == list(range(nproc)), local
    else:
        assert local == [pid], (local, pid)  # one stream per process
    maps = runner.get_idepth_maps()
    assert maps.shape[0] == len(local)
    meshes = runner.get_meshes()
    assert len(meshes) == len(local)
    stats = runner.flush_stats()

    # Per-process accuracy of ITS stream vs GT (stream pid lags pid
    # frames; >= 3 poseframe rounds ran, so the mesh is installed and
    # fresh).
    ref = max(n_frames - 1 - pid, 0)
    gt = 1.0 / np.maximum(seq.depths[ref], 1e-6)
    m = np.isfinite(maps[0]) & (seq.depths[ref] > 0)
    assert m.mean() > 0.4, f"coverage {m.mean()}"
    med = float(np.median(np.abs(maps[0] - gt)[m]))
    assert med < 0.05, f"median idepth err {med}"
    uv, x, tris = meshes[0]
    assert len(tris) >= 1 and np.isfinite(x).all()
    assert stats and stats[0]["coverage"] > 0.3
    if spatial:
        assert runner.spatial and runner.parts is not None
    tag = "DIST_E2E_SPATIAL_OK" if spatial else "DIST_E2E_OK"
    print(f"{tag} pid={pid} nproc={nproc} frames={n_frames} "
          f"pf_rounds={(n_frames + 5) // 6} cov={m.mean():.3f} "
          f"med_err={med:.4f} tris={len(tris)}", flush=True)

    if bench:
        # Timed AFTER the accuracy checks: the wrap-around replay below
        # teleports poses every cycle (throughput load, not a tracking
        # scenario), so it must not feed the GT assertions above.
        runner.get_idepth_maps()
        t0 = time.perf_counter()
        n_bench = 24
        for i in range(n_bench):
            runner.update([frame(max((i % 13) - s, 0))
                           for s in range(nproc)])
        runner.get_idepth_maps()
        fps = nproc * n_bench / (time.perf_counter() - t0)
        print(f"DIST_E2E_FPS pid={pid} fps={fps:.2f}", flush=True)
    runner.shutdown()


def _opt(name: str, default: str = "") -> str:
    for a in sys.argv[1:]:
        if a.startswith(f"--{name}="):
            return a.split("=", 1)[1]
    return default


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    main(int(args[0]), int(args[1]), int(args[2]),
         int(args[3]) if len(args) > 3 else 13,
         bench="--bench" in sys.argv,
         single="--single" in sys.argv,
         spatial="--spatial" in sys.argv,
         ckpt=_opt("ckpt"),
         ckpt_at=int(_opt("ckpt-at", "0")),
         ckpt_load="--ckpt-load" in sys.argv,
         pause_after_save=float(_opt("pause-after-save", "0")))

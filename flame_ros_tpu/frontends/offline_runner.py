"""Offline dataset frontends: TUM / EuRoC-ASL / synthetic batch runners.

Capability parity with FlameOfflineTUM (reference src/flame_offline_tum.cc)
and FlameOffline/ASL (src/flame_offline_asl.cc): wire an offline stream to
the engine, process frames at an optional throttle rate, compute GT truth
stats per frame (confusion matrix + stats.txt, reference protocol), stream
per-frame telemetry as JSONL (replacing FlameStats messages), and export
mesh/depth products.

Usage (module CLI):
  python -m flame_ros_tpu.frontends.offline_runner --dataset synthetic \
      --frames 60 --out /tmp/flame_out
  python -m flame_ros_tpu.frontends.offline_runner --dataset tum \
      --input assoc.txt --calib calib.yaml --input-frame RDF --out out/
  python -m flame_ros_tpu.frontends.offline_runner --dataset asl \
      --pose-path mav0/state_groundtruth_estimate0 --rgb-path mav0/cam0 \
      --world-frame RDF --out out/
"""
from __future__ import annotations

import argparse
import json
import os
import time as time_mod
from dataclasses import dataclass
from typing import Iterable, Optional

import numpy as np

from flame_ros_tpu.config import FlameParams
from flame_ros_tpu.eval.metrics import StatsFileWriter, TruthStats
from flame_ros_tpu.geometry.se3 import SE3
from flame_ros_tpu.models.engine import Flame
from flame_ros_tpu.utils.load_tracker import LoadTracker


@dataclass
class RunResult:
    frames_processed: int = 0
    frames_failed: int = 0
    fps: float = 0.0
    mean_rmse: float = float("nan")
    mean_precision: float = float("nan")
    mean_recall: float = float("nan")
    final_coverage: float = 0.0
    # Standard monodepth metrics on the FINAL frame's dense map (meters):
    # comparable against the monodepth literature.
    final_abs_rel: float = float("nan")
    final_delta1: float = float("nan")
    stats_path: Optional[str] = None
    # Tracking-mode (no GT poses) trajectory metrics. ate_rmse is
    # Horn/SE3-aligned (scale errors count — monocular scale is anchored
    # by the bootstrap depth); sim3 removes scale (drift diagnostic);
    # raw is origin-aligned (both trajectories start at identity).
    ate_rmse: float = float("nan")
    ate_rmse_sim3: float = float("nan")
    ate_rmse_raw: float = float("nan")
    gt_path_length: float = float("nan")
    # Relative pose error (TUM evaluate_rpe, eval.metrics.rpe): ATE on a
    # short rotation-dominant path bounds almost nothing (VERDICT r4
    # weak #6 — a 0.27 m pan caps ATE at cm regardless of rotation
    # quality); rotational RPE at delta=1 sees every per-frame
    # orientation error directly and is what the rotation acceptance
    # gate pins. delta30 ~= per-second drift at the nominal 30 fps.
    rpe_trans_rmse: float = float("nan")      # m, delta = 1 frame
    rpe_rot_rmse_deg: float = float("nan")    # deg, delta = 1 frame
    rpe30_trans_rmse: float = float("nan")    # m, delta = 30 frames
    rpe30_rot_rmse_deg: float = float("nan")  # deg, delta = 30 frames
    # Tracking failure-gate outcomes (VERDICT r4 weak #1): frames whose
    # pose the gate rejected (dropped, reference semantics) and how many
    # recoveries went through the keyframe-ring re-search.
    track_failed_frames: int = 0
    relocalizations: int = 0


def _final_depth_metrics(res: "RunResult", engine, last_gt) -> None:
    if last_gt is None:
        return
    import jax.numpy as jnp
    from flame_ros_tpu.eval.metrics import depth_metrics
    m = depth_metrics(jnp.asarray(engine.get_inverse_depth_map()),
                      jnp.asarray(last_gt, jnp.float32))
    res.final_abs_rel = float(m["abs_rel"])
    res.final_delta1 = float(m["delta1"])


def run_offline_windowed(frames: Iterable, cam, params: FlameParams,
                         out_dir: Optional[str] = None,
                         window: int = 6,
                         max_frames: Optional[int] = None,
                         save_products: bool = False,
                         quiet: bool = True) -> RunResult:
    """Window-batched offline run: each poseframe-aligned window of frames
    runs as ONE device dispatch with device-side GT evaluation — the
    high-throughput eval path (telemetry still lands per frame)."""
    engine = Flame(cam.width, cam.height, cam=cam, params=params)
    writer = StatsFileWriter(out_dir) if out_dir else None
    jsonl = open(os.path.join(out_dir, "telemetry.jsonl"), "w") \
        if out_dir else None
    pf_every = params.input.poseframe_subsample_factor
    sub = params.input.subsample_factor
    last_gt = None
    res = RunResult()
    rmses, precs, recs = [], [], []
    t_start = time_mod.perf_counter()
    n_proc = 0
    buf, gts, times = [], [], []

    def flush():
        nonlocal n_proc
        if not buf:
            return
        has_gt = all(g is not None for g in gts)
        engine.update_window(buf, np.stack(gts) if has_gt else None)
        recs_w = engine.flush_window_stats()
        for (t, fid, _, _, _), rec in zip(buf, recs_w):
            if has_gt and rec.get("true_pos", -1) >= 0:
                ts = TruthStats.from_record(rec)
                rmses.append(ts.rmse)
                if np.isfinite(ts.precision):
                    precs.append(ts.precision)
                if np.isfinite(ts.recall):
                    recs.append(ts.recall)
                if writer:
                    writer.append(n_proc, t, 0.0, int(rec["num_vtx"]),
                                  int(rec["num_tris"]), ts,
                                  rec["total_photo_error"],
                                  rec["avg_photo_error"])
            if jsonl:
                rec2 = {"img_id": fid, "timestamp": t, **rec}
                jsonl.write(json.dumps(rec2) + "\n")
            n_proc += 1
        buf.clear()
        gts.clear()

    for frame in frames:
        if max_frames is not None and frame.img_id >= max_frames:
            break
        if frame.img_id % sub:
            continue
        is_pf = (n_proc + len(buf)) % pf_every == 0
        if is_pf and buf:
            flush()
        pose = SE3.from_quat_trans(frame.quat, frame.trans)
        buf.append((frame.time, frame.img_id, pose, frame.gray, is_pf))
        gts.append(frame.depth if np.any(frame.depth > 0) else None)
        if gts[-1] is not None:
            last_gt = gts[-1]
        if len(buf) >= window:
            flush()
    flush()

    res.frames_processed = n_proc
    res.fps = n_proc / max(time_mod.perf_counter() - t_start, 1e-6)
    if rmses:
        res.mean_rmse = float(np.mean(rmses))
    if precs:
        res.mean_precision = float(np.mean(precs))
    if recs:
        res.mean_recall = float(np.mean(recs))
    _final_depth_metrics(res, engine, last_gt)
    res.final_coverage = float(engine.stats_.stats("coverage"))
    if writer:
        res.stats_path = writer.path
    if jsonl:
        jsonl.close()
    if out_dir and save_products:
        uv, x, normals, tris, keep, edges = engine.get_inverse_depth_mesh()
        np.savez(os.path.join(out_dir, "final_mesh.npz"),
                 vertices_px=uv, idepths=x, normals=normals,
                 triangles=tris, tri_validity=keep, edges=edges,
                 K=cam.K)
        np.save(os.path.join(out_dir, "final_idepth.npy"),
                engine.get_inverse_depth_map())
    return res


def run_offline(frames: Iterable, cam, params: FlameParams,
                out_dir: Optional[str] = None,
                pass_in_truth: bool = False,
                rate: float = 0.0,
                max_frames: Optional[int] = None,
                save_products: bool = False,
                quiet: bool = True) -> RunResult:
    """Drive the engine over any stream yielding frames with
    (img_id, time, gray, depth, quat, trans) attributes."""
    engine = Flame(cam.width, cam.height, cam=cam, params=params)
    writer = StatsFileWriter(out_dir) if out_dir else None
    jsonl = open(os.path.join(out_dir, "telemetry.jsonl"), "w") \
        if out_dir else None
    load = LoadTracker()
    pf_every = params.input.poseframe_subsample_factor
    sub = params.input.subsample_factor

    res = RunResult()
    rmses, precs, recs = [], [], []
    last_gt = None
    t_start = time_mod.perf_counter()
    n_proc = 0
    for frame in frames:
        if max_frames is not None and frame.img_id >= max_frames:
            break
        if frame.img_id % sub:
            continue
        pose = SE3.from_quat_trans(frame.quat, frame.trans)
        is_pf = (n_proc % pf_every) == 0
        has_gt = np.any(frame.depth > 0)
        if has_gt:
            last_gt = frame.depth
        truth = None
        if pass_in_truth and has_gt:
            truth = np.where(frame.depth > 0,
                             1.0 / np.maximum(frame.depth, 1e-6),
                             0.0).astype(np.float32)
        engine.stats_.tick("sense")
        ok = engine.update(frame.time, frame.img_id, pose, frame.gray,
                           is_pf, idepths_truth=truth,
                           gt_depth=frame.depth if has_gt else None)
        engine.stats_.tock("sense")
        if not ok:
            res.frames_failed += 1
            continue
        n_proc += 1

        st = engine.stats_
        rec = engine.flush_stats()  # one small D2H; GT block included
        if has_gt:
            ts = TruthStats.from_record(rec)
            rmses.append(ts.rmse)
            if np.isfinite(ts.precision):
                precs.append(ts.precision)
            if np.isfinite(ts.recall):
                recs.append(ts.recall)
            if writer:
                writer.append(
                    n_proc - 1, frame.time, st.timings("sense"),
                    int(rec["num_vtx"]), int(rec["num_tris"]),
                    ts, rec["total_photo_error"], rec["avg_photo_error"])

        elapsed = time_mod.perf_counter() - t_start
        st.set("fps", n_proc / max(elapsed, 1e-6))
        st.set("fps_max", 1e3 / max(st.timings("update"), 1e-6))
        if n_proc % params.output.load_integration_factor == 0:
            snap = load.get()
            st.set("pid_load_cpu", snap.pid_load.cpu)
            st.set("pid_load_mem", snap.pid_load.mem)
            st.set("sys_load_cpu", snap.sys_load.cpu)
        if jsonl:
            st.dump_jsonl(jsonl, frame.img_id, frame.time)
        if not quiet:
            print(f"frame {frame.img_id}: feats="
                  f"{int(st.stats('num_feats'))} "
                  f"tris={int(st.stats('num_tris'))} "
                  f"coverage={st.stats('coverage'):.2f} "
                  f"update={st.timings('update'):.1f}ms")
        if rate > 0:
            budget = 1.0 / rate - (time_mod.perf_counter() - t_start
                                   - (n_proc - 1) / rate)
            if budget > 0:
                time_mod.sleep(budget)

    res.frames_processed = n_proc
    res.fps = n_proc / max(time_mod.perf_counter() - t_start, 1e-6)
    if rmses:
        res.mean_rmse = float(np.mean(rmses))
    if precs:
        res.mean_precision = float(np.mean(precs))
    if recs:
        res.mean_recall = float(np.mean(recs))
    _final_depth_metrics(res, engine, last_gt)
    res.final_coverage = float(engine.stats_.stats("coverage"))
    if writer:
        res.stats_path = writer.path
    if jsonl:
        jsonl.close()
    if out_dir and save_products:
        uv, x, normals, tris, keep, edges = engine.get_inverse_depth_mesh()
        np.savez(os.path.join(out_dir, "final_mesh.npz"),
                 vertices_px=uv, idepths=x, normals=normals,
                 triangles=tris, tri_validity=keep, edges=edges,
                 K=cam.K)
        np.save(os.path.join(out_dir, "final_idepth.npy"),
                engine.get_inverse_depth_map())
    return res


def run_offline_tracking(frames: Iterable, cam, params: FlameParams,
                         out_dir: Optional[str] = None,
                         ba_refine: bool = False,
                         max_frames: Optional[int] = None,
                         quiet: bool = True) -> RunResult:
    """BASELINE config 4: online streaming with NO GT poses. Poses are
    estimated by the nodelet's direct tracker (+ windowed pose graph, and
    optionally photometric windowed BA over the keyframe ring at
    poseframe rate — `ba_refine`). Input poses, if the stream has them,
    are used ONLY as the GT trajectory for ATE evaluation; the first
    frame's depth map fixes monocular scale (RGB-D-style bootstrap);
    depth on later frames feeds only the GT confusion matrix.

    Reports the same stats.txt/JSONL products as `run_offline` plus the
    ATE block (Horn-aligned — eval.metrics.ate_rmse docstring states the
    protocol). Reference analog: the trajectory-consuming online frontend
    (src/flame_nodelet.cc:414-479) — which never evaluates ATE.
    """
    from flame_ros_tpu.eval.metrics import ate_rmse, rpe
    from flame_ros_tpu.frontends.nodelet import FlameNodelet

    # trajectory_cap=0 → unbounded: the ATE window must cover the whole
    # run regardless of its length (ADVICE r4 — the default 100k rolling
    # window would silently truncate >100k-frame evaluations).
    node = FlameNodelet(cam, params, pose_source="tracking",
                        ba_refine=ba_refine, eval_gt_depth=True,
                        trajectory_cap=0)
    writer = StatsFileWriter(out_dir) if out_dir else None
    jsonl = open(os.path.join(out_dir, "telemetry.jsonl"), "w") \
        if out_dir else None

    res = RunResult()
    rmses, precs, recs = [], [], []
    last_gt = None
    gt_poses: dict[int, np.ndarray] = {}   # img_id -> GT position
    n_seen = 0

    def on_stats(rec):
        nonlocal n_seen
        if rec.get("true_pos", -1) >= 0:
            ts = TruthStats.from_record(rec)
            rmses.append(ts.rmse)
            if np.isfinite(ts.precision):
                precs.append(ts.precision)
            if np.isfinite(ts.recall):
                recs.append(ts.recall)
            if writer:
                writer.append(n_seen, rec["timestamp"],
                              rec.get("update_ms", 0.0),
                              int(rec["num_vtx"]), int(rec["num_tris"]),
                              ts, rec["total_photo_error"],
                              rec["avg_photo_error"])
        if jsonl:
            jsonl.write(json.dumps(rec) + "\n")
        n_seen += 1

    node.on_stats.append(on_stats)
    t_start = time_mod.perf_counter()
    for frame in frames:
        if max_frames is not None and frame.img_id >= max_frames:
            break
        if frame.quat is not None:
            gt_poses[frame.img_id] = (np.asarray(frame.quat, np.float64),
                                      np.asarray(frame.trans, np.float64))
        if np.any(frame.depth > 0):
            last_gt = frame.depth
        node.push_frame(frame.img_id, frame.time, gray=frame.gray,
                        depth=frame.depth)
        node.run_until_idle(idle_timeout=0.01)
        if not quiet and node.trajectory:
            fid, _, pose = node.trajectory[-1]
            print(f"frame {fid}: est_t={np.round(np.asarray(pose.t), 3)}")
    node.engine.shutdown()

    res.frames_processed = len(node.trajectory)
    res.frames_failed = node.engine.num_failed_frames
    res.track_failed_frames = node.n_track_failed_frames
    res.relocalizations = node.n_relocalizations
    res.fps = res.frames_processed / max(
        time_mod.perf_counter() - t_start, 1e-6)
    if rmses:
        res.mean_rmse = float(np.mean(rmses))
    if precs:
        res.mean_precision = float(np.mean(precs))
    if recs:
        res.mean_recall = float(np.mean(recs))
    _final_depth_metrics(res, node.engine, last_gt)
    res.final_coverage = float(node.engine.stats_.stats("coverage"))
    if writer:
        res.stats_path = writer.path
    if jsonl:
        jsonl.close()

    pairs = [(np.asarray(p.q, np.float64), np.asarray(p.t, np.float64),
              gt_poses[fid])
             for fid, _, p in node.trajectory if fid in gt_poses]
    if len(pairs) >= 3:
        est_q = np.stack([q for q, _, _ in pairs])
        est_t = np.stack([t for _, t, _ in pairs])
        gt_q = np.stack([g[0] for _, _, g in pairs])
        gt_t = np.stack([g[1] for _, _, g in pairs])
        res.ate_rmse = ate_rmse(est_t, gt_t, align="se3")
        res.ate_rmse_sim3 = ate_rmse(est_t, gt_t, align="sim3")
        res.ate_rmse_raw = ate_rmse(est_t, gt_t, align="none")
        res.gt_path_length = float(
            np.sum(np.linalg.norm(np.diff(gt_t, axis=0), axis=1)))
        r1 = rpe(est_q, est_t, gt_q, gt_t, delta=1)
        res.rpe_trans_rmse = r1["trans_rmse"]
        res.rpe_rot_rmse_deg = r1["rot_rmse_deg"]
        if len(pairs) > 30:
            r30 = rpe(est_q, est_t, gt_q, gt_t, delta=30)
            res.rpe30_trans_rmse = r30["trans_rmse"]
            res.rpe30_rot_rmse_deg = r30["rot_rmse_deg"]
    return res


def with_occlusion(frames: Iterable, start: int, end: int,
                   value: float = 250.0):
    """Tracking-killer injection harness (VERDICT r4 weak #1 stress
    mode): replace the gray content of frames [start, end] (inclusive)
    with a uniform flash — a full-frame occlusion / white-out that no
    photometric tracker can align — leaving poses and depths untouched
    so the ATE ground truth stays valid. Drives the tracking failure
    gate + keyframe-ring relocalization recovery path
    (frontends/nodelet.py). The reference's closest analog is its
    pose-corruption block (src/flame_offline_tum.cc:438-489, disabled);
    it has no image-corruption harness."""
    for frame in frames:
        if start <= frame.img_id <= end:
            frame.gray = np.full_like(np.asarray(frame.gray), value)
        yield frame


def with_pose_noise(frames: Iterable, sigma_trans: float,
                    sigma_rot_deg: float, seed: int = 0):
    """Pose-noise ablation wrapper (reference: the Gaussian SE3 noise
    block in src/flame_offline_tum.cc:438-489, promoted to a first-class
    runner mode per SURVEY §4.4): right-perturb every input pose by a
    random SE3 tangent draw, leaving images/depths clean, so the run
    measures robustness of the depth estimate to odometry error."""
    from flame_ros_tpu.geometry.se3 import random_se3

    rng = np.random.default_rng(seed)
    sr = np.radians(sigma_rot_deg)
    for frame in frames:
        noise = random_se3(rng, sigma_rot=sr, sigma_trans=sigma_trans)
        noisy = SE3.from_quat_trans(frame.quat, frame.trans) @ noise
        frame.quat = np.asarray(noisy.q, np.float32)
        frame.trans = np.asarray(noisy.t, np.float32)
        yield frame


def _build_frames(args):
    if args.dataset == "synthetic":
        from flame_ros_tpu.datasets.synthetic import make_sequence, QVGA, VGA

        cam = VGA if args.resolution == "vga" else QVGA
        seq = make_sequence(n_frames=args.frames or 60, cam=cam,
                            motion=args.motion,
                            texture_gain=args.texture_gain,
                            exposure_amp=args.exposure_amp,
                            scene=args.scene)

        @dataclass
        class F:
            img_id: int
            time: float
            gray: np.ndarray
            depth: np.ndarray
            quat: np.ndarray
            trans: np.ndarray

        def gen():
            for i in range(len(seq)):
                yield F(i, seq.timestamps[i], seq.images[i], seq.depths[i],
                        np.asarray(seq.poses.q[i]),
                        np.asarray(seq.poses.t[i]))
        return gen(), seq.cam
    if args.dataset == "tum":
        from flame_ros_tpu.datasets.tum import (
            TUMRGBDStream, load_camera_info_yaml)
        calib = load_camera_info_yaml(args.calib) if args.calib else None
        stream = TUMRGBDStream(args.input, calib=calib,
                               input_frame=args.input_frame,
                               depth_scale_factor=args.depth_scale_factor,
                               resize_factor=args.resize_factor)
        return iter(stream), stream.cam
    if args.dataset == "asl":
        from flame_ros_tpu.datasets.asl import ASLRGBDStream
        stream = ASLRGBDStream(args.pose_path, args.rgb_path,
                               depth_path=args.depth_path,
                               world_frame=args.world_frame,
                               resize_factor=args.resize_factor)
        return iter(stream), stream.cam
    raise ValueError(args.dataset)


def main(argv=None):
    # CLI entry: honor the caller's JAX_PLATFORMS before any jax op —
    # the axon sitecustomize otherwise hijacks a cpu request onto the
    # remote TPU and the run silently reports the wrong backend's
    # accuracy (utils/platform.py has the measured delta).
    from flame_ros_tpu.utils.platform import pin_requested_platform
    pin_requested_platform()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", choices=["tum", "asl", "synthetic"],
                   required=True)
    p.add_argument("--input", help="TUM association file")
    p.add_argument("--calib", help="ROS CameraInfo YAML")
    p.add_argument("--input-frame", default="RDF")
    p.add_argument("--depth-scale-factor", type=float, default=5000.0)
    p.add_argument("--pose-path", help="ASL pose sensor folder")
    p.add_argument("--rgb-path", help="ASL camera folder")
    p.add_argument("--depth-path", help="ASL depth folder")
    p.add_argument("--world-frame", default="RDF")
    p.add_argument("--config", help="FlameParams YAML")
    p.add_argument("--out", help="output directory")
    p.add_argument("--frames", type=int, help="max frames")
    p.add_argument("--rate", type=float, default=0.0,
                   help="throttle to N fps (0 = unthrottled)")
    p.add_argument("--pass-in-truth", action="store_true")
    p.add_argument("--resize-factor", type=int, default=1)
    p.add_argument("--motion", default="strafe",
                   help="synthetic trajectory: strafe/forward/rotation/"
                        "mav (6-DoF EuRoC-like)/static")
    p.add_argument("--scene", default="room",
                   choices=["room", "primitives"],
                   help="synthetic scene family: room (closed surfaces) "
                        "or primitives (occluding boxes/spheres — depth "
                        "discontinuities)")
    p.add_argument("--texture-gain", type=float, default=1.0,
                   help="synthetic: contrast scale about mid-gray "
                        "(0.15 = low-texture stress regime)")
    p.add_argument("--exposure-amp", type=float, default=0.0,
                   help="synthetic: auto-exposure oscillation amplitude "
                        "(0.5 = exposure stress regime)")
    p.add_argument("--zero-mean-ssd", action="store_true",
                   help="brightness-offset-invariant epipolar matching "
                        "(engine.zero_mean_ssd; for auto-exposure input)")
    p.add_argument("--resolution", default="qvga",
                   choices=["qvga", "vga"])
    p.add_argument("--save-products", action="store_true")
    p.add_argument("--verbose", action="store_true")
    p.add_argument("--window", type=int, default=0,
                   help="batch N frames per device dispatch (0 = per-frame)")
    p.add_argument("--pose-source", default="external",
                   choices=["external", "tracking"],
                   help="tracking = BASELINE config 4: estimate poses "
                        "online (direct tracker + pose graph); input "
                        "poses are used only for ATE evaluation")
    p.add_argument("--ba-refine", action="store_true",
                   help="tracking mode: windowed photometric BA over the "
                        "keyframe ring at poseframe rate")
    p.add_argument("--profile-stages", action="store_true",
                   help="populate the reference's 13-stage timing "
                        "vocabulary at debug rate (costs host syncs)")
    p.add_argument("--pose-noise-sigma", type=float, default=0.0,
                   help="pose-noise ablation: translation sigma in "
                        "meters applied to every input pose")
    p.add_argument("--pose-noise-rot-sigma", type=float, default=0.0,
                   help="pose-noise ablation: rotation sigma in degrees")
    p.add_argument("--pose-noise-seed", type=int, default=0)
    p.add_argument("--occlude", default="",
                   help="tracking-killer stress injection: START:END "
                        "(inclusive frame ids) replaced by a uniform "
                        "white flash; images only, poses/depths stay "
                        "valid for evaluation")
    args = p.parse_args(argv)
    if args.dataset == "tum" and not args.input:
        p.error("--dataset tum requires --input <association file>")
    if args.dataset == "asl" and not (args.pose_path and args.rgb_path):
        p.error("--dataset asl requires --pose-path and --rgb-path")

    params = (FlameParams.from_yaml(args.config) if args.config
              else FlameParams())
    if args.profile_stages:
        import dataclasses as _dc
        params = _dc.replace(
            params, debug=_dc.replace(params.debug, profile_stages=True))
    if args.zero_mean_ssd:
        import dataclasses as _dc
        params = _dc.replace(
            params, engine=_dc.replace(params.engine, zero_mean_ssd=True))
    frames, cam = _build_frames(args)
    if args.occlude:
        occ_start, occ_end = (int(x) for x in args.occlude.split(":"))
        frames = with_occlusion(frames, occ_start, occ_end)
    if args.pose_noise_sigma > 0 or args.pose_noise_rot_sigma > 0:
        frames = with_pose_noise(frames, args.pose_noise_sigma,
                                 args.pose_noise_rot_sigma,
                                 seed=args.pose_noise_seed)
    if args.out:
        os.makedirs(args.out, exist_ok=True)
    if args.pose_source == "tracking":
        if args.window > 0 or args.pass_in_truth or args.rate > 0:
            p.error("--pose-source tracking is incompatible with "
                    "--window/--pass-in-truth/--rate")
        if args.pose_noise_sigma > 0 or args.pose_noise_rot_sigma > 0:
            # Tracking mode treats the input poses as GT for the ATE
            # block only — noising them would silently evaluate the
            # tracker against noise and report it as 'GT' ATE.
            p.error("--pose-source tracking is incompatible with "
                    "--pose-noise-* (the input poses are the ATE "
                    "ground truth)")
        res = run_offline_tracking(
            frames, cam, params, out_dir=args.out,
            ba_refine=args.ba_refine, max_frames=args.frames,
            quiet=not args.verbose)
    elif args.window > 0:
        if args.pass_in_truth or args.rate > 0:
            p.error("--window is incompatible with --pass-in-truth/--rate")
        res = run_offline_windowed(
            frames, cam, params, out_dir=args.out, window=args.window,
            max_frames=args.frames, save_products=args.save_products,
            quiet=not args.verbose)
    else:
        res = run_offline(frames, cam, params, out_dir=args.out,
                          pass_in_truth=args.pass_in_truth, rate=args.rate,
                          max_frames=args.frames,
                          save_products=args.save_products,
                          quiet=not args.verbose)
    summary = {
        "frames": res.frames_processed,
        "failed": res.frames_failed,
        "fps": round(res.fps, 2),
        "idepth_rmse": (round(res.mean_rmse, 5)
                        if np.isfinite(res.mean_rmse) else None),
        "precision": (round(res.mean_precision, 4)
                      if np.isfinite(res.mean_precision) else None),
        "recall": (round(res.mean_recall, 4)
                   if np.isfinite(res.mean_recall) else None),
        "coverage": round(res.final_coverage, 4),
        "abs_rel": (round(res.final_abs_rel, 4)
                    if np.isfinite(res.final_abs_rel) else None),
        "delta1": (round(res.final_delta1, 4)
                   if np.isfinite(res.final_delta1) else None),
    }
    if args.pose_source == "tracking":
        summary.update({
            "ate_rmse": (round(res.ate_rmse, 5)
                         if np.isfinite(res.ate_rmse) else None),
            "ate_rmse_sim3": (round(res.ate_rmse_sim3, 5)
                              if np.isfinite(res.ate_rmse_sim3) else None),
            "ate_rmse_raw": (round(res.ate_rmse_raw, 5)
                             if np.isfinite(res.ate_rmse_raw) else None),
            "gt_path_length": (round(res.gt_path_length, 4)
                               if np.isfinite(res.gt_path_length) else None),
            "track_failed_frames": res.track_failed_frames,
            "relocalizations": res.relocalizations,
            "rpe_trans_rmse": (round(res.rpe_trans_rmse, 5)
                               if np.isfinite(res.rpe_trans_rmse) else None),
            "rpe_rot_rmse_deg": (
                round(res.rpe_rot_rmse_deg, 4)
                if np.isfinite(res.rpe_rot_rmse_deg) else None),
            "rpe30_trans_rmse": (
                round(res.rpe30_trans_rmse, 5)
                if np.isfinite(res.rpe30_trans_rmse) else None),
            "rpe30_rot_rmse_deg": (
                round(res.rpe30_rot_rmse_deg, 4)
                if np.isfinite(res.rpe30_rot_rmse_deg) else None),
        })
    print(json.dumps(summary))
    return res


def main_tum(argv=None):
    return main(["--dataset", "tum"] + (argv or []))


def main_asl(argv=None):
    return main(["--dataset", "asl"] + (argv or []))


if __name__ == "__main__":
    main()

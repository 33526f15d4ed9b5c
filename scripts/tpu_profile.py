"""Batched on-chip component profiling for the FLaME engine.

Measures (with REAL data pulls — block_until_ready is a no-op on tunneled
PJRT backends) the per-component device cost at VGA on the current
backend, printing one JSON line per measurement. Designed to run in ONE
process per session: every measurement is idempotent and cheap to skip.

Usage: python scripts/tpu_profile.py [--quick]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _time_op(fn, *args, iters=20, warmup=2, pull=None):
    """Time a jitted op by chaining `iters` dispatches then pulling one
    scalar-ish slice. Returns ms/iter."""
    for _ in range(warmup):
        out = fn(*args)
    _force(out if pull is None else pull(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _force(out if pull is None else pull(out))
    dt = time.perf_counter() - t0
    return dt / iters * 1e3


def _force(x):
    import jax
    leaf = jax.tree.leaves(x)[0]
    np.asarray(leaf).ravel()[:1]


def emit(name, ms, **kw):
    rec = {"component": name, "ms": round(ms, 3)}
    rec.update(kw)
    print(json.dumps(rec), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--variants", default="",
                    help="chainablate: 'name,section.key,value;...'")
    ap.add_argument("--only", default="",
                    help="comma-separated subset: raster,epi,pd,frame,bench")
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    import jax
    import jax.numpy as jnp

    print(json.dumps({"backend": jax.default_backend(),
                      "devices": len(jax.devices())}), flush=True)

    from flame_ros_tpu.config import FlameParams
    from flame_ros_tpu.datasets.synthetic import make_sequence, VGA
    from flame_ros_tpu.geometry.se3 import SE3
    from flame_ros_tpu.models.engine import Flame

    # --- populate a realistic engine state -----------------------------
    n_seq = 30
    seq = make_sequence(n_frames=n_seq, cam=VGA, motion="strafe")
    imgs = [np.clip(im, 0, 255).astype(np.uint8) for im in seq.images]
    params = FlameParams().resolved(jax.default_backend())
    engine = Flame(VGA.width, VGA.height, cam=VGA, params=params)
    t_setup0 = time.perf_counter()
    for w0 in range(0, 24, 6):
        frames = [(seq.timestamps[i], i,
                   SE3(seq.poses.q[i], seq.poses.t[i]), imgs[i], i % 6 == 0)
                  for i in range(w0, w0 + 6)]
        engine.update_window(frames)
    rec = engine.flush_stats()
    print(json.dumps({"setup_s": round(time.perf_counter() - t_setup0, 1),
                      "num_tris": rec["num_tris"],
                      "num_feats": rec["num_feats"],
                      "coverage": round(rec["coverage"], 3)}), flush=True)
    st = engine.state
    iters = 5 if args.quick else 20

    # --- rasterizer variants -------------------------------------------
    if only is None or "raster" in only:
        from flame_ros_tpu.ops import raster as raster_ops
        from flame_ros_tpu.ops import raster_pallas as rp
        H, W = VGA.height, VGA.width

        ms = _time_op(lambda: raster_ops.rasterize_tri_ids(
            st.vtx_uv, st.tris, st.tri_valid, height=H, width=W),
            iters=iters)
        emit("raster_xla", ms)
        try:
            ms = _time_op(lambda: rp.rasterize_tri_ids_pallas(
                st.vtx_uv, st.tris, st.tri_valid, height=H, width=W),
                iters=iters)
            emit("raster_pallas_v2", ms)
        except Exception as e:
            emit("raster_pallas_v2", -1.0, error=str(e)[:200])
        for (cs, cl, lt, rt) in [(384, 128, 48.0, 2), (448, 128, 64.0, 2),
                                 (320, 96, 48.0, 2), (384, 128, 48.0, 1),
                                 (384, 128, 48.0, 3), (512, 64, 96.0, 2)]:
            try:
                out4 = rp.rasterize_tri_ids_pallas_v4(
                    st.vtx_uv, st.tris, st.tri_valid, height=H, width=W,
                    cand_s=cs, cand_l=cl, long_thresh=lt, row_tile=rt)
                out2 = rp.rasterize_tri_ids_pallas(
                    st.vtx_uv, st.tris, st.tri_valid, height=H, width=W)
                agree = bool(jnp.mean((out4 == out2).astype(
                    jnp.float32)) > 0.9999)
                ms = _time_op(lambda cs=cs, cl=cl, lt=lt, rt=rt:
                              rp.rasterize_tri_ids_pallas_v4(
                                  st.vtx_uv, st.tris, st.tri_valid,
                                  height=H, width=W, cand_s=cs, cand_l=cl,
                                  long_thresh=lt, row_tile=rt),
                              iters=iters)
                emit(f"raster_v4_cs{cs}_cl{cl}_lt{int(lt)}_rt{rt}", ms,
                     agree_v2=agree)
            except Exception as e:
                emit(f"raster_v4_cs{cs}_cl{cl}_lt{int(lt)}_rt{rt}", -1.0,
                     error=str(e)[:200])
        try:
            out3 = rp.rasterize_tri_ids_pallas_v3(
                st.vtx_uv, st.tris, st.tri_valid, height=H, width=W)
            out2 = rp.rasterize_tri_ids_pallas(
                st.vtx_uv, st.tris, st.tri_valid, height=H, width=W)
            agree = bool(jnp.mean((out3 == out2).astype(jnp.float32)) > 0.9999)
            ms = _time_op(lambda: rp.rasterize_tri_ids_pallas_v3(
                st.vtx_uv, st.tris, st.tri_valid, height=H, width=W),
                iters=iters)
            emit("raster_pallas_v3", ms, agree_v2=agree)
        except Exception as e:
            emit("raster_pallas_v3", -1.0, error=str(e)[:200])

    # --- epipolar -------------------------------------------------------
    if only is None or "epi" in only:
        from flame_ros_tpu.ops import epipolar as ep_ops
        from flame_ros_tpu.ops.pyramid import build_pyramid
        img_pyr = build_pyramid(jnp.asarray(imgs[25], jnp.float32), 3)
        q = jnp.asarray(seq.poses.q[25], jnp.float32)
        t = jnp.asarray(seq.poses.t[25], jnp.float32)
        for ns in (32, 16):
            for gd in ("float32", "bfloat16"):
                ms = _time_op(
                    lambda ns=ns, gd=gd: ep_ops.epipolar_update(
                        st.feat, st.kf_pyrs, st.kf_q, st.kf_t, img_pyr,
                        q, t, cam=VGA, num_samples=ns, gather_dtype=gd),
                    iters=iters, pull=lambda r: r.state.mu)
                emit(f"epipolar_s{ns}_{gd}", ms)

    # --- NLTGV2 PD ------------------------------------------------------
    if only is None or "pd" in only:
        from flame_ros_tpu.ops import nltgv2 as reg_ops
        top = reg_ops.build_topology(st.edges, st.edge_valid, st.vtx_uv,
                                     inc_edges=st.inc_edges,
                                     inc_sign=st.inc_sign)
        lam = reg_ops.data_weights(st.feat.var, st.vtx_in_graph,
                                   data_factor=0.15, adaptive=False,
                                   rescale=False)
        gs = reg_ops.GraphState(x=st.vtx_x, w=st.vtx_w, q=st.edge_q,
                                x_bar=st.vtx_x, w_bar=st.vtx_w)
        ms = _time_op(lambda: reg_ops.pd_iterate(
            gs, top, st.vtx_z, lam, st.vtx_in_graph, num_iters=10,
            step_x=0.001, step_q=125.0, theta=1.0),
            iters=iters, pull=lambda g: g.x)
        emit("pd_10sweeps", ms)

    # --- full chained frame cost ---------------------------------------
    if only is None or "frame" in only:
        # WIN=6 windows back-to-back with NO host work between dispatches:
        # measures pure device cost per frame (plus one pull at the end).
        def run_chain(n_win, with_pf):
            t0 = time.perf_counter()
            for k in range(n_win):
                w0 = 24 + k
                frames = [(seq.timestamps[(w0 + j) % n_seq] + k,
                           100 + k * 6 + j,
                           SE3(seq.poses.q[(w0 + j) % n_seq],
                               seq.poses.t[(w0 + j) % n_seq]),
                           imgs[(w0 + j) % n_seq], with_pf and j == 0)
                          for j in range(6)]
                engine.update_window(frames)
            _force(engine.state.vtx_x)
            return time.perf_counter() - t0

        n_win = 3 if args.quick else 8
        run_chain(1, False)  # warm any residual compiles
        dt = run_chain(n_win, False)
        emit("frame_chained_win6_nopf", dt / (n_win * 6) * 1e3,
             fps=round(n_win * 6 / dt, 2))
        dt = run_chain(n_win, True)
        emit("frame_chained_win6_pf", dt / (n_win * 6) * 1e3,
             fps=round(n_win * 6 / dt, 2))

    # --- dissect: dispatch-only vs link cost ---------------------------
    if only is None or "dissect" in only:
        from flame_ros_tpu.models.engine import (_window_step, _track_step,
                                                 _smooth_step, _ZERO_IMG)
        from flame_ros_tpu.ops.pyramid import build_pyramid
        H, W = VGA.height, VGA.width
        frames = [(seq.timestamps[i], 200 + i,
                   SE3(seq.poses.q[i], seq.poses.t[i]), imgs[i], False)
                  for i in range(6)]
        packed, _, _, _, B = engine._pack_segments(frames, None)[0]
        # H2D upload cost of one packed window.
        t0 = time.perf_counter()
        for _ in range(3):
            pd_ = jax.device_put(packed)
            np.asarray(pd_[:1, :1])
        emit("h2d_window6", (time.perf_counter() - t0) / 3 * 1e3,
             mb=round(packed.nbytes / 1e6, 2))
        packed_dev = jax.device_put(packed)
        gt_dev = jnp.zeros((B, H, W), jnp.float32)
        stt = engine.state
        ms = _time_op(
            lambda: _window_step(stt, packed_dev, gt_dev, cam=VGA,
                                 params=engine.params, has_gt=False,
                                 first_is_pf=False)[0].vtx_x,
            iters=max(iters // 2, 4))
        emit("window6_dispatch_only", ms, per_frame=round(ms / 6, 2))
        # Same chain with the poseframe variant (detection + keyframe
        # ring insert + slot allocation unrolled for frame 0) — the
        # product steady state at pf_subsample = window size.
        frames_pf = [frames[0][:4] + (True,)] + frames[1:]
        packed_pf, _, _, _, _ = engine._pack_segments(frames_pf, None)[0]
        packed_pf_dev = jax.device_put(packed_pf)
        ms = _time_op(
            lambda: _window_step(stt, packed_pf_dev, gt_dev, cam=VGA,
                                 params=engine.params, has_gt=False,
                                 first_is_pf=True)[0].vtx_x,
            iters=max(iters // 2, 4))
        emit("window6_dispatch_only_pf", ms, per_frame=round(ms / 6, 2))
        img_pyr = build_pyramid(jnp.asarray(imgs[25], jnp.float32), 3)
        q = jnp.asarray(seq.poses.q[25], jnp.float32)
        t = jnp.asarray(seq.poses.t[25], jnp.float32)
        ms = _time_op(
            lambda: _track_step(stt, img_pyr, q, t, jnp.int32(300),
                                jnp.int32(0), jnp.asarray(False),
                                _ZERO_IMG(VGA), cam=VGA,
                                params=engine.params,
                                use_truth=False)[0].feat.mu,
            iters=iters)
        emit("track_step", ms)
        counts = jnp.zeros((7,), jnp.float32)
        ms = _time_op(
            lambda: _smooth_step(stt, img_pyr, q, t, counts, _ZERO_IMG(VGA),
                                 cam=VGA, params=engine.params,
                                 has_gt=False)[2],
            iters=iters)
        emit("smooth_step", ms)
        ms = _time_op(lambda: build_pyramid(
            jnp.asarray(imgs[25], jnp.float32), 3), iters=iters)
        emit("build_pyramid", ms)

    # --- carried-state chain: the true steady-state window cost ---------
    if only is not None and "chain" in only:
        from flame_ros_tpu.models.engine import _window_step
        H, W = VGA.height, VGA.width
        n_win = 12
        bufs = []
        for k in range(n_win):
            frames = [(seq.timestamps[(24 + k + j) % n_seq] + k,
                       400 + k * 6 + j,
                       SE3(seq.poses.q[(24 + k + j) % n_seq],
                           seq.poses.t[(24 + k + j) % n_seq]),
                       imgs[(24 + k + j) % n_seq], j == 0)
                      for j in range(6)]
            packed, _, _, _, _ = engine._pack_segments(frames, None)[0]
            d = jax.device_put(packed)
            np.asarray(jnp.ravel(d)[:1])  # force the upload to land
            bufs.append(d)
        gt_dev = jnp.zeros((6, H, W), jnp.float32)
        stc = engine.state

        def chain(st, warm):
            for k in range(n_win):
                st, *_ = _window_step(st, bufs[k], gt_dev, cam=VGA,
                                      params=engine.params, has_gt=False,
                                      first_is_pf=True)
            _force(st.vtx_x)
            return st
        stc = chain(stc, True)  # warm
        t0 = time.perf_counter()
        chain(stc, False)
        dt = time.perf_counter() - t0
        emit("chain_carried_pf", dt / n_win * 1e3,
             per_frame=round(dt / (n_win * 6) * 1e3, 2),
             fps=round(n_win * 6 / dt, 2))

    # --- carried-chain ablations: attribute the steady-state budget -----
    if only is not None and "chainablate" in only:
        from flame_ros_tpu.models.engine import _window_step
        import dataclasses as _dc
        H, W = VGA.height, VGA.width
        n_win = 8
        bufs = []
        for k in range(n_win):
            frames = [(seq.timestamps[(24 + k + j) % n_seq] + k,
                       700 + k * 6 + j,
                       SE3(seq.poses.q[(24 + k + j) % n_seq],
                           seq.poses.t[(24 + k + j) % n_seq]),
                       imgs[(24 + k + j) % n_seq], j == 0)
                      for j in range(6)]
            packed, _, _, _, _ = engine._pack_segments(frames, None)[0]
            d = jax.device_put(packed)
            np.asarray(jnp.ravel(d)[:1])
            bufs.append(d)
        gt_dev = jnp.zeros((6, H, W), jnp.float32)

        def run_variant(name, pvar):
            st = engine.state

            def chain(st):
                for k in range(n_win):
                    st, *_ = _window_step(st, bufs[k], gt_dev, cam=VGA,
                                          params=pvar, has_gt=False,
                                          first_is_pf=True)
                _force(st.vtx_x)
                return st
            st = chain(st)  # warm/compile
            t0 = time.perf_counter()
            chain(st)
            dt = time.perf_counter() - t0
            emit(f"chain_{name}", dt / n_win * 1e3,
                 per_frame=round(dt / (n_win * 6) * 1e3, 2))

        p0 = engine.params
        if args.variants:
            for spec in args.variants.split(";"):
                name, path, val = spec.split(",")
                sect, key = path.split(".")
                import ast
                v = ast.literal_eval(val)
                pvar = _dc.replace(p0, **{sect: _dc.replace(
                    getattr(p0, sect), **{key: v})})
                run_variant(name, pvar)
        else:
            run_variant("base", p0)
            run_variant("pd0", _dc.replace(p0, regularization=_dc.replace(
                p0.regularization, do_nltgv2=False)))
            run_variant("epi8", _dc.replace(p0, engine=_dc.replace(
                p0.engine, num_search_samples=8)))
            run_variant("raster_xla", _dc.replace(p0, engine=_dc.replace(
                p0.engine, use_pallas_raster=False)))
            run_variant("epi_bf16", _dc.replace(p0, engine=_dc.replace(
                p0.engine, compute_dtype="bfloat16")))

    # --- multi-stream aggregate throughput on one chip ------------------
    if only is not None and "mstream" in only:
        from flame_ros_tpu.parallel.multi_stream import (
            MultiStreamRunner, batched_full_step)
        from flame_ros_tpu.geometry.se3 import SE3 as _SE3
        for S in (2, 4):
            runner = MultiStreamRunner(VGA, S, params=params)
            # Warm state: run a few real frames (incl. poseframes +
            # triangulation) so the measured step sees live topology.
            for i in range(13):
                frames = [(seq.timestamps[(i + 2 * s) % n_seq], i,
                           _SE3(seq.poses.q[(i + 2 * s) % n_seq],
                                seq.poses.t[(i + 2 * s) % n_seq]),
                           imgs[(i + 2 * s) % n_seq]) for s in range(S)]
                runner.update(frames)
            from flame_ros_tpu.models import engine as eng_mod
            packed_dev = jax.device_put(np.stack([np.concatenate([
                imgs[(20 + s) % n_seq].ravel(),
                eng_mod.pack_frame_meta(
                    seq.poses.q[(20 + s) % n_seq],
                    seq.poses.t[(20 + s) % n_seq], 500, False, 0)])
                for s in range(S)]))
            gt_dev = jnp.zeros((S, VGA.height, VGA.width), jnp.float32)
            stb = runner.states
            ms = _time_op(
                lambda: batched_full_step(
                    stb, packed_dev, gt_dev, cam=VGA,
                    params=runner.params, is_pf=False,
                    has_gt=False)[0].vtx_x,
                iters=max(iters // 2, 4))
            emit(f"mstream{S}_dispatch_only", ms,
                 per_frame=round(ms / S, 2),
                 agg_fps=round(S / (ms / 1e3), 1))

    # --- v3 diagnosis + tuning sweep -----------------------------------
    if only is not None and "v3" in only:
        from flame_ros_tpu.ops import raster_pallas as rp
        H, W = VGA.height, VGA.width
        uv = np.asarray(st.vtx_uv)
        tris_h = np.asarray(st.tris)
        tv_h = np.asarray(st.tri_valid)
        ys = uv[tris_h, 1]
        ymin = ys.min(1)
        ymax = ys.max(1)
        for (tb, sb, lb, lt, rt) in [(256, 3, 1, 32.0, 2),
                                     (256, 2, 1, 24.0, 2),
                                     (512, 2, 1, 32.0, 2),
                                     (128, 4, 1, 24.0, 2),
                                     (64, 6, 1, 24.0, 2),
                                     (256, 3, 1, 32.0, 4)]:
            # Host-side fits diagnostic (mirrors the wrapper's math).
            extent = np.where(tv_h, ymax - ymin, np.inf)
            klass = np.where(tv_h, np.where(extent <= lt, 0, 1), 2)
            key = klass * 1e7 + np.clip(ymin, 0, 1e7 - 1)
            key_s = np.sort(key)
            n_short = np.searchsorted(key_s, 1e7 - 0.5)
            n_live = np.searchsorted(key_s, 2e7 - 0.5)
            tile_y0 = np.arange((H * W) // (rt * W)) * rt
            lo_pos = np.searchsorted(key_s, np.clip(tile_y0 - lt, 0, None))
            hi_pos = np.minimum(np.searchsorted(key_s, tile_y0 + rt),
                                n_short)
            lo_blk = lo_pos // tb
            nblk_s = np.maximum((hi_pos + tb - 1) // tb - lo_blk, 0)
            n_lblk = max((n_live + tb - 1) // tb - n_short // tb, 0)
            fits = (nblk_s.max() <= sb) and (n_lblk <= lb)
            try:
                ms = _time_op(lambda tb=tb, sb=sb, lb=lb, lt=lt, rt=rt:
                              rp.rasterize_tri_ids_pallas_v3(
                                  st.vtx_uv, st.tris, st.tri_valid,
                                  height=H, width=W, tri_block=tb,
                                  s_blocks=sb, l_blocks=lb,
                                  long_thresh=lt, row_tile=rt),
                              iters=iters)
            except Exception as e:
                ms = -1.0
            emit(f"v3_tb{tb}_sb{sb}_lb{lb}_lt{int(lt)}_rt{rt}", ms,
                 fits=bool(fits), max_nblk_s=int(nblk_s.max()),
                 n_lblk=int(n_lblk), n_short=int(n_short),
                 n_long=int(n_live - n_short))

    # --- end-to-end bench ----------------------------------------------
    if only is not None and "bench" in only:
        import subprocess
        out = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))), "bench.py")],
            capture_output=True, text=True, timeout=1800)
        print(out.stdout.strip(), flush=True)
        if out.returncode:
            print(json.dumps({"bench_error": out.stderr[-300:]}), flush=True)


if __name__ == "__main__":
    main()

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
from functools import partial

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
    ap.add_argument("--micro-names", default="",
                    help="comma-separated micro-variant subset (default all)")
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None
    MICRO_VARIANTS = {
        "base", "nodet", "noring", "nomedian", "nodetect", "pd_gather",
        "nopyr", "noproj", "noepi", "noraster", "nocosts", "photo32",
        "pd_iters0", "pdoff", "build_gcat"}
    micro_names = (
        {n.strip() for n in args.micro_names.split(",") if n.strip()}
        if args.micro_names else None)
    if micro_names is not None:
        unknown = micro_names - MICRO_VARIANTS
        if unknown:
            ap.error(f"unknown --micro-names {sorted(unknown)}; "
                     f"known: {sorted(MICRO_VARIANTS)}")

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
    # Host poses: device-array poses cost one link RTT per frame in the
    # ingest gate / meta packing (see bench.py; measured ~400 ms/window).
    import dataclasses as _dcp
    seq = _dcp.replace(seq, poses=SE3(np.asarray(seq.poses.q),
                                      np.asarray(seq.poses.t)))
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
        packed, _, _, _, B, _ = engine._pack_segments(frames, None)[0]
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
        packed_pf, _, _, _, _, _ = engine._pack_segments(frames_pf, None)[0]
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
            packed, _, _, _, _, _ = engine._pack_segments(frames, None)[0]
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
            packed, _, _, _, _, _ = engine._pack_segments(frames, None)[0]
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

    # --- micro: monkeypatch ablations of the carried chain --------------
    # Attributes the residual "misc" budget (pyramid build, projections,
    # epipolar, raster, costs telemetry) by stubbing one component at a
    # time and re-jitting the raw window step (fresh jax.jit per variant so
    # the patched module globals are picked up at trace time).
    if only is not None and "micro" in only:
        from flame_ros_tpu.models import engine as EM
        from flame_ros_tpu.ops import epipolar as EP
        from flame_ros_tpu.ops import raster as RO
        from flame_ros_tpu.ops import nltgv2 as RG
        import dataclasses as _dc
        H, W = VGA.height, VGA.width
        n_win = 8
        bufs = []
        for k in range(n_win):
            frames = [(seq.timestamps[(24 + k + j) % n_seq] + k,
                       900 + k * 6 + j,
                       SE3(seq.poses.q[(24 + k + j) % n_seq],
                           seq.poses.t[(24 + k + j) % n_seq]),
                       imgs[(24 + k + j) % n_seq], j == 0)
                      for j in range(6)]
            packed, _, _, _, _, _ = engine._pack_segments(frames, None)[0]
            d = jax.device_put(packed)
            np.asarray(jnp.ravel(d)[:1])
            bufs.append(d)
        gt_dev = jnp.zeros((6, H, W), jnp.float32)
        p0 = engine.params
        T = p0.engine.max_triangles
        N = p0.engine.max_features

        def run(name, pvar=p0, patches=(), first_is_pf=True):
            if micro_names is not None and name not in micro_names:
                return
            saved = [(m, a, getattr(m, a)) for m, a, _ in patches]
            for m, a, v in patches:
                setattr(m, a, v)
            try:
                # A FRESH function identity per variant: pjit caches
                # globally on the underlying callable, so re-jitting the
                # same raw function would silently reuse the unpatched
                # compile.
                def raw(state, packed, gt, *, cam, params, has_gt,
                        first_is_pf):
                    return EM._window_step.__wrapped__(
                        state, packed, gt, cam=cam, params=params,
                        has_gt=has_gt, first_is_pf=first_is_pf)
                step = jax.jit(
                    raw,
                    static_argnames=("cam", "params", "has_gt",
                                     "first_is_pf"))

                def chain(st):
                    for k in range(n_win):
                        st, *_ = step(st, bufs[k], gt_dev, cam=VGA,
                                      params=pvar, has_gt=False,
                                      first_is_pf=first_is_pf)
                    _force(st.vtx_x)
                    return st
                st = chain(engine.state)  # compile + warm
                t0 = time.perf_counter()
                chain(st)
                dt = time.perf_counter() - t0
                emit(f"micro_{name}", dt / n_win * 1e3,
                     per_frame=round(dt / (n_win * 6) * 1e3, 2))
            except Exception as e:
                emit(f"micro_{name}", -1.0, error=str(e)[:200])
            finally:
                for m, a, old in saved:
                    setattr(m, a, old)

        def fake_pyr(img, num_levels=3):
            return jnp.broadcast_to(img[None], (num_levels,) + img.shape)

        def fake_proj(state, kf_q, kf_t, cur_q, cur_t, cam):
            return (state.uv_ref, state.mu,
                    jnp.ones_like(state.mu, dtype=bool))

        def fake_epi(state, kf_pyrs, kf_q, kf_t, img_pyr, cur_q, cur_t,
                     **kw):
            z32 = jnp.zeros_like(state.kf_idx)
            return EP.EpipolarResult(
                state=state, status=z32,
                xi_meas=jnp.zeros_like(state.mu),
                uv_match=jnp.zeros_like(state.uv_ref),
                counts={k: jnp.int32(0) for k in (
                    "num_idepth_updates", "num_fail_ref_patch_grad",
                    "num_fail_ambiguous_match", "num_fail_max_cost",
                    "num_fail_max_dropouts", "num_fail_max_var")})

        def fake_raster(vtx_uv, vtx_x, tris, tri_valid, *, height, width,
                        **kw):
            return (jnp.full((height, width), -1, jnp.int32),
                    jnp.zeros((tris.shape[0], 3), jnp.float32))

        def fake_costs(*a, **kw):
            return {}

        def fake_detect(img, occupied_cells, *, win_size, min_grad_mag,
                        do_letterbox=False):
            nc = occupied_cells.size
            return (jnp.zeros((nc, 2), jnp.float32),
                    jnp.zeros((nc,), jnp.float32),
                    jnp.zeros((nc,), bool))

        if micro_names is None or "build_gcat" in micro_names:
            _gc = jax.jit(RG.build_gcat, static_argnums=2)
            ms = _time_op(lambda: _gc(
                engine.state.edges, engine.state.edge_valid, N),
                iters=iters)
            emit("pd_mm_build_gcat_scatter", ms)

        def fake_ring(state, img_pyr, cur_q, cur_t, frame_id, kf_slot):
            return (state.kf_pyrs, state.kf_q, state.kf_t,
                    state.kf_valid, state.kf_ids)

        def fake_median(vals, mask, fallback):
            return jnp.asarray(fallback, jnp.float32) + 0 * vals[0]

        run("base")
        run("nodet", first_is_pf=False)
        run("noring", patches=[(EM, "_ring_insert", fake_ring)])
        run("nomedian", patches=[(EM, "_masked_median", fake_median)])
        run("nodetect", patches=[(EM, "detect_features", fake_detect)])
        run("pd_gather", pvar=_dc.replace(p0, engine=_dc.replace(
            p0.engine, nltgv2_adjoint="gather")))
        run("nopyr", patches=[(EM, "build_pyramid", fake_pyr)])
        run("noproj", patches=[(EP, "project_features", fake_proj)])
        run("noepi", patches=[(EP, "epipolar_update", fake_epi)])
        run("noraster", patches=[(RO, "rasterize_ids", fake_raster)])
        run("nocosts", patches=[(RG, "nltgv2_costs", fake_costs)])
        run("photo32", pvar=_dc.replace(p0, engine=_dc.replace(
            p0.engine, photo_stride=32)))
        run("pd_iters0", pvar=_dc.replace(p0, engine=_dc.replace(
            p0.engine, pd_iters_per_frame=0)))
        run("pdoff", pvar=_dc.replace(p0, regularization=_dc.replace(
            p0.regularization, do_nltgv2=False)))

    # --- det: poseframe-branch piecewise standalone timings --------------
    if only is not None and "det" in only:
        from flame_ros_tpu.models import engine as EM
        from flame_ros_tpu.ops import epipolar as EP
        from flame_ros_tpu.ops.detection import (detect_features,
                                                 occupancy_from_features)
        from flame_ros_tpu.ops.gradients import gradient_magnitude
        from flame_ros_tpu.ops.pyramid import build_pyramid
        H, W = VGA.height, VGA.width
        img = jnp.asarray(imgs[25], jnp.float32)
        det = params.features.detection
        occ = jnp.zeros((H // det.win_size, W // det.win_size), bool)

        ms = _time_op(lambda: jax.jit(gradient_magnitude)(img), iters=iters)
        emit("det_gradmag", ms)
        ms = _time_op(lambda: detect_features(
            img, occ, win_size=det.win_size,
            min_grad_mag=det.min_grad_mag), iters=iters,
            pull=lambda r: r[0])
        emit("det_detect_features", ms)
        ms = _time_op(lambda: jax.jit(occupancy_from_features,
                                      static_argnums=(2, 3, 4))(
            st.vtx_uv, st.feat.valid, H, W, det.win_size), iters=iters)
        emit("det_occupancy", ms)
        ms = _time_op(lambda: jax.jit(EM._masked_median)(
            st.feat.mu, st.feat.valid, jnp.float32(0.5)), iters=iters)
        emit("det_masked_median", ms)
        img_pyr = build_pyramid(img, 3)
        ms = _time_op(lambda: jax.jit(EM._ring_insert)(
            engine.state, img_pyr,
            jnp.asarray(seq.poses.q[25], jnp.float32),
            jnp.asarray(seq.poses.t[25], jnp.float32),
            jnp.int32(999), jnp.int32(3)), iters=iters,
            pull=lambda r: r[0])
        emit("det_ring_insert", ms)
        ms = _time_op(lambda: jax.jit(EP.project_features,
                                      static_argnames=("cam",))(
            st.feat, st.kf_q, st.kf_t,
            jnp.asarray(seq.poses.q[25], jnp.float32),
            jnp.asarray(seq.poses.t[25], jnp.float32), cam=VGA),
            iters=iters, pull=lambda r: r[0])
        emit("det_project_features", ms)

        # Composed pf-branch-ish jit: occupancy + detect + rank-match
        # allocation, one program.
        @jax.jit
        def pf_combo(uv_cur, feat_valid, mu, img):
            occ2 = occupancy_from_features(uv_cur, feat_valid, H, W,
                                           det.win_size)
            duv, dscore, dvalid = detect_features(
                img, occ2, win_size=det.win_size,
                min_grad_mag=det.min_grad_mag)
            free = ~feat_valid
            det_rank = jnp.cumsum(dvalid.astype(jnp.int32)) - 1
            free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1
            n_free = jnp.sum(free.astype(jnp.int32))
            take = dvalid & (det_rank < n_free)
            oh = (free[:, None] & take[None, :]
                  & (free_rank[:, None] == det_rank[None, :]))
            hit = jnp.any(oh, axis=1)
            vals = jnp.stack([duv[:, 0], duv[:, 1], dscore,
                              jnp.ones_like(dscore)], -1)
            got = jnp.dot(oh.astype(jnp.float32), vals,
                          preferred_element_type=jnp.float32)
            return jnp.where(hit, got[:, 2], mu)

        ms = _time_op(lambda: pf_combo(
            st.vtx_uv, st.feat.valid, st.feat.mu, img), iters=iters)
        emit("det_pf_combo", ms)

    # --- pdx: NLTGV2 PD experiments (sweep slope + MXU adjoint) ---------
    if only is not None and "pdx" in only:
        from flame_ros_tpu.ops import nltgv2 as reg_ops
        top = reg_ops.build_topology(st.edges, st.edge_valid, st.vtx_uv,
                                     inc_edges=st.inc_edges,
                                     inc_sign=st.inc_sign)
        lam = reg_ops.data_weights(st.feat.var, st.vtx_in_graph,
                                   data_factor=0.15, adaptive=False,
                                   rescale=False)
        gs = reg_ops.GraphState(x=st.vtx_x, w=st.vtx_w, q=st.edge_q,
                                x_bar=st.vtx_x, w_bar=st.vtx_w)
        for ni in (1, 2, 5, 10, 20):
            ms = _time_op(lambda ni=ni: reg_ops.pd_iterate(
                gs, top, st.vtx_z, lam, st.vtx_in_graph, num_iters=ni,
                step_x=0.001, step_q=125.0, theta=1.0),
                iters=iters, pull=lambda g: g.x)
            emit(f"pd_sweeps{ni}", ms)

        # MXU-adjoint prototype: the K^T incidence gather ([V, D, 3]
        # gather + masked reduce) becomes ONE [V, 2E] @ [2E, 3] matmul
        # with a 0/1 bf16 incidence matrix (exact in bf16); the dual
        # edge values convert to bf16 (f32 accumulate).
        V = st.vtx_x.shape[0]
        E = st.edges.shape[0]
        ev = top.edge_valid

        @jax.jit
        def build_gcat(edges, ev):
            vids = jnp.arange(V, dtype=jnp.int32)
            gi = ((edges[:, 0][:, None] == vids[None, :])
                  & ev[:, None]).astype(jnp.bfloat16)
            gj = ((edges[:, 1][:, None] == vids[None, :])
                  & ev[:, None]).astype(jnp.bfloat16)
            return jnp.concatenate([gi, gj], 0).T  # [V, 2E]

        gcat = build_gcat(st.edges, ev)
        _force(gcat)

        sigma, tau_x, tau_w = reg_ops._precond_steps(top, V)

        @partial(jax.jit, static_argnames=("num_iters",))
        def pd_iterate_mm(state, top, z, lam, vtx_valid, gcat,
                          *, num_iters=10, theta=1.0):
            i = top.edges[:, 0]
            j = top.edges[:, 1]
            evf = top.edge_valid[:, None].astype(state.x.dtype)
            edge_k1w = jnp.concatenate(
                [top.alpha[:, None], top.alpha[:, None] * top.dp], -1)
            tau_xw = jnp.concatenate([tau_x[:, None], tau_w], -1)
            thr = tau_x * lam
            vm3 = vtx_valid.astype(state.x.dtype)[:, None]

            def pack(x, w):
                return jnp.concatenate([x[:, None], w], -1)

            def body(_, carry):
                xw, xwb, q = carry
                pi = xwb[i]
                pj = xwb[j]
                k1 = (edge_k1w[:, 0] * (pi[:, 0] - pj[:, 0])
                      - edge_k1w[:, 1] * pi[:, 1]
                      - edge_k1w[:, 2] * pi[:, 2])
                kw = top.beta[:, None] * (pi[:, 1:] - pj[:, 1:])
                Kx = jnp.concatenate([k1[:, None], kw], -1)
                q = jnp.clip(q + sigma * Kx, -1.0, 1.0) * evf
                a_q1 = top.alpha * q[:, 0]
                bq = top.beta[:, None] * q[:, 1:]
                t_tail = jnp.concatenate(
                    [a_q1[:, None],
                     -a_q1[:, None] * top.dp + bq], -1)
                t_head = jnp.concatenate([-a_q1[:, None], -bq], -1)
                tcat = jnp.concatenate([t_tail, t_head], 0)  # [2E, 3]
                g = jnp.dot(gcat, tcat.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
                xw_desc = xw - tau_xw * g
                r = xw_desc[:, 0] - z
                x_new = z + jnp.sign(r) * jnp.maximum(
                    jnp.abs(r) - thr, 0.0)
                xw_new = jnp.concatenate(
                    [x_new[:, None], xw_desc[:, 1:]], -1)
                xw_new = vm3 * xw_new + (1 - vm3) * xw
                xwb = xw_new + theta * (xw_new - xw)
                return (xw_new, xwb, q)

            xw, xwb, q = jax.lax.fori_loop(
                0, num_iters, body,
                (pack(state.x, state.w), pack(state.x_bar, state.w_bar),
                 state.q), unroll=min(num_iters, 10))
            return reg_ops.GraphState(x=xw[:, 0], w=xw[:, 1:], q=q,
                                      x_bar=xwb[:, 0], w_bar=xwb[:, 1:])

        out_ref = reg_ops.pd_iterate(gs, top, st.vtx_z, lam,
                                     st.vtx_in_graph, num_iters=10,
                                     step_x=0.001, step_q=125.0, theta=1.0)
        out_mm = pd_iterate_mm(gs, top, st.vtx_z, lam, st.vtx_in_graph,
                               gcat, num_iters=10)
        live = np.asarray(st.vtx_in_graph)
        dx = np.abs(np.asarray(out_mm.x) - np.asarray(out_ref.x))[live]
        ref_mag = np.abs(np.asarray(out_ref.x))[live]
        emit("pd_mm_err", 0.0,
             max_abs=float(dx.max()) if dx.size else 0.0,
             rel_med=float(np.median(dx / np.maximum(ref_mag, 1e-3)))
             if dx.size else 0.0)
        ms = _time_op(lambda: pd_iterate_mm(
            gs, top, st.vtx_z, lam, st.vtx_in_graph, gcat, num_iters=10),
            iters=iters, pull=lambda g: g.x)
        emit("pd_mm_10sweeps", ms)
        ms = _time_op(lambda: build_gcat(st.edges, ev), iters=iters)
        emit("pd_mm_build_gcat", ms)

    # --- rhalf: half-resolution raster prototype ------------------------
    if only is not None and "rhalf" in only:
        from flame_ros_tpu.ops import raster_pallas as rp
        H, W = VGA.height, VGA.width
        uv_half = st.vtx_uv * 0.5
        for (h, w, cs, cl) in [(H // 2, W // 2, 384, 128),
                               (H // 2, W // 2, 256, 96),
                               (H, W, 384, 128)]:
            uvs = st.vtx_uv * (h / H)
            try:
                ms = _time_op(lambda uvs=uvs, h=h, w=w, cs=cs, cl=cl:
                              rp.rasterize_tri_ids_pallas_v4(
                                  uvs, st.tris, st.tri_valid,
                                  height=h, width=w, cand_s=cs, cand_l=cl,
                                  long_thresh=48.0, row_tile=2),
                              iters=iters)
                emit(f"rhalf_{h}x{w}_cs{cs}_cl{cl}", ms)
            except Exception as e:
                emit(f"rhalf_{h}x{w}_cs{cs}_cl{cl}", -1.0,
                     error=str(e)[:200])

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

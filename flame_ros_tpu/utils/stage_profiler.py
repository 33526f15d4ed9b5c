"""Debug-rate per-stage timing profiler.

The engine runs each frame as two FUSED device dispatches (`_track_step` +
`_smooth_step`), so per-stage wall times cannot be observed in the product
path — XLA deliberately erases the stage boundaries the reference times
individually (msg/FlameStats.msg:31-46, stage scopes at
src/flame_nodelet.cc:533-610). This module recovers the reference's
13-stage timing vocabulary on demand: every stage is re-run STANDALONE as
its own jitted computation against the engine's current state, timed with
a forced device pull, and written into the engine's StatsTracker.

The standalone stage costs are accurate device costs for each stage (the
fused product dispatch is faster than their sum — fusion is the point),
so the populated vocabulary is an upper bound per stage, honest for
telemetry comparison. Each timing subtracts the measured D2H sync
latency (dominant on tunneled PJRT links, where even a 4-byte pull costs
~10 ms) so stage numbers reflect device compute, not link latency.

Enabled by `debug.profile_stages` (+ `debug.profile_stages_every`) or
`offline_runner --profile-stages`; runs at debug rate (every Nth frame).
"""
from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    np.asarray(jax.tree.leaves(x)[0]).ravel()[:1]


def _time(fn, *args, iters: int = 2) -> float:
    """ms per call, median of `iters` timed calls (first call compiles)."""
    fn(*args)  # compile / warm
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


@partial(jax.jit, static_argnames=("cam",))
def _proj_graph_jit(state, cur_q, cur_t, cam):
    from flame_ros_tpu.models.engine import _project_graph_core
    return _project_graph_core(state, cur_q, cur_t, cam)


@jax.jit
def _keyframe_insert_jit(state, img_pyr, cur_q, cur_t, kf_slot):
    """The keyframe-ring insert piece of the poseframe branch."""
    evict = (state.feat.valid & (state.feat.kf_idx == kf_slot)
             & state.kf_valid[kf_slot])
    feat = state.feat._replace(valid=state.feat.valid & ~evict)
    return state._replace(
        feat=feat,
        kf_pyrs=state.kf_pyrs.at[kf_slot].set(img_pyr),
        kf_q=state.kf_q.at[kf_slot].set(cur_q),
        kf_t=state.kf_t.at[kf_slot].set(cur_t),
        kf_valid=state.kf_valid.at[kf_slot].set(True))


@jax.jit
def _alloc_jit(feat_valid, dvalid, duv):
    """The detection->free-slot allocation scatter (the reference's
    detection_loop: iterating detections into the feature set)."""
    free = ~feat_valid
    order = jnp.argsort(feat_valid)
    det_rank = jnp.cumsum(dvalid.astype(jnp.int32)) - 1
    n_free = jnp.sum(free.astype(jnp.int32))
    take = dvalid & (det_rank < n_free)
    slot_for_det = order[jnp.clip(det_rank, 0, feat_valid.shape[0] - 1)]
    tgt = jnp.where(take, slot_for_det, feat_valid.shape[0])
    uv_ref = jnp.zeros((feat_valid.shape[0], 2), jnp.float32)
    return uv_ref.at[tgt].set(duv, mode="drop"), take


def profile_stages(engine, img_gray, pose) -> dict:
    """Measure the 13-stage vocabulary against `engine`'s current state
    using (img_gray, pose) as the current frame. Returns {stage: ms} and
    writes each into engine.stats_ (set_timing)."""
    from flame_ros_tpu.models.engine import NUM_LEVELS
    from flame_ros_tpu.ops import epipolar as ep_ops
    from flame_ros_tpu.ops import nltgv2 as reg_ops
    from flame_ros_tpu.ops import raster as raster_ops
    from flame_ros_tpu.ops.detection import (detect_features,
                                             occupancy_from_features)
    from flame_ros_tpu.ops.pyramid import build_pyramid

    st = engine.state
    cam = engine.cam
    params = engine.params
    det = params.features.detection
    eng = params.engine

    img = jnp.asarray(np.asarray(img_gray), jnp.float32)
    cur_q = jnp.asarray(np.asarray(pose.q), jnp.float32)
    cur_t = jnp.asarray(np.asarray(pose.t), jnp.float32)

    # Baseline D2H sync latency (subtracted from every stage time): on
    # tunneled PJRT links the pull itself costs ~10 ms; locally it's ~0.
    zero = jnp.zeros((1,), jnp.float32)
    base = _time(lambda: zero + 1.0)

    out = {}

    def rec(name, ms):
        out[name] = max(ms - base, 0.0)
        engine.stats_.set_timing(name, out[name])

    rec("frame_creation", _time(
        lambda: build_pyramid(img, NUM_LEVELS)))
    img_pyr = build_pyramid(img, NUM_LEVELS)

    rec("update_idepths", _time(
        lambda: ep_ops.epipolar_update(
            st.feat, st.kf_pyrs, st.kf_q, st.kf_t, img_pyr, cur_q, cur_t,
            cam=cam, num_samples=eng.num_search_samples,
            patch_size=params.features.tracking.win_size,
            num_levels=NUM_LEVELS).state.mu))

    rec("project_features", _time(
        lambda: ep_ops.project_features(
            st.feat, st.kf_q, st.kf_t, cur_q, cur_t, cam)))

    rec("project_graph", _time(
        lambda: _proj_graph_jit(st, cur_q, cur_t, cam)))

    rec("keyframe", _time(
        lambda: _keyframe_insert_jit(st, img_pyr, cur_q, cur_t,
                                     jnp.int32(0)).kf_valid))

    uv_cur, z_cur, inb = ep_ops.project_features(
        st.feat, st.kf_q, st.kf_t, cur_q, cur_t, cam)
    occ = occupancy_from_features(uv_cur, st.feat.valid & inb,
                                  cam.height, cam.width, det.win_size)
    rec("detection", _time(
        lambda: detect_features(img_pyr[0], occ, win_size=det.win_size,
                                min_grad_mag=det.min_grad_mag,
                                do_letterbox=params.features.do_letterbox)))
    duv, dscore, dvalid = detect_features(
        img_pyr[0], occ, win_size=det.win_size,
        min_grad_mag=det.min_grad_mag,
        do_letterbox=params.features.do_letterbox)
    rec("detection_loop", _time(
        lambda: _alloc_jit(st.feat.valid, dvalid, duv)))

    # interpolate: the reference interpolates the predicted dense idepth
    # map into the new frame to warm-start it (msg/FlameStats.msg:33; cfg
    # nltgv2/init_with_prediction). The analog here is the plane-sample
    # of the last rasterized map at the new detections — fused into the
    # track step on the product path, timed standalone at debug rate like
    # every other stage.
    rec("interpolate", _time(
        lambda: raster_ops.sample_idepth_at(st.last_idmap, st.last_planes,
                                            duv)[0]))

    # sync_graph: the post-triangulation graph smoothing + rasterization
    # dispatch (NLTGV2 sweeps + raster + photo error = _smooth_step).
    from flame_ros_tpu.models.engine import _ZERO_IMG, _smooth_step
    counts = jnp.zeros((7,), jnp.float32)
    rec("sync_graph", _time(
        lambda: _smooth_step(st, img_pyr, cur_q, cur_t, counts,
                             _ZERO_IMG(cam), cam=cam, params=params,
                             has_gt=False)[2]))

    reg = params.regularization
    if reg.do_median_filter:
        rec("median_filter", _time(
            lambda: reg_ops.graph_median(st.vtx_x, st.inc_edges,
                                         st.inc_sign, st.edges,
                                         st.vtx_in_graph)))
    else:
        rec("median_filter", base)  # disabled -> 0 after baseline subtract
    if reg.do_lowpass_filter:
        rec("lowpass_filter", _time(
            lambda: reg_ops.graph_lowpass(st.vtx_x, st.edges,
                                          st.edge_valid, st.vtx_in_graph)))
    else:
        rec("lowpass_filter", base)

    # triangulate: the host Delaunay + incidence build + pack (the real
    # per-poseframe cost; the engine also ticks this live at pf rate).
    uv_h = np.asarray(st.vtx_uv)
    el_h = np.asarray(st.vtx_in_graph)
    t0 = time.perf_counter()
    engine._build_topology_host(uv_h, el_h)
    rec("triangulate", (time.perf_counter() - t0) * 1e3 + base)

    return out

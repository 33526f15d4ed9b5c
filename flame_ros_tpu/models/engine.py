"""The FLaME engine: device-resident dense monocular depth estimation.

API parity with flame::Flame (reference call surface reconstructed in
SURVEY §2.9 from flame_ros call sites: ctor `Flame(width, height, K, Kinv,
params)` src/flame_nodelet.cc:523-527, `update(time, id, pose, gray,
is_poseframe[, idepths_truth])` :634, mesh/depthmap/feature getters,
`updatePoseFramePoses`/`prunePoseFrames`, `stats()`), re-architected
TPU-first:

- ALL numeric state is a pytree of fixed-shape device arrays
  (`EngineState`): padded feature slots with validity masks, a keyframe
  ring of image pyramids, and the Delaunay graph as padded edge/triangle
  lists. The reference's per-feature pointer structures become masked
  lanes.
- One frame = two fused XLA computations around a single host sync:
  `_track_step` (epipolar filtering + feature/graph projection +
  detection/slot allocation on poseframes) -> [host: incremental Delaunay
  via the native C++ triangulator, poseframe rate only] ->
  `_smooth_step` (NLTGV2-L1 primal-dual sweeps + rasterization + photo
  error). Non-poseframes skip the host sync entirely.
- Stage timings keep the reference's 13-key vocabulary
  (msg/FlameStats.msg:31-46) so telemetry is comparable.
"""
from __future__ import annotations

import time as time_mod
from collections import deque
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from flame_ros_tpu.config import FlameParams
from flame_ros_tpu.geometry.camera import Pinhole
from flame_ros_tpu.geometry.se3 import SE3, quat_conj, quat_mul, quat_rotate
from flame_ros_tpu.graph.delaunay import triangulate, edges_from_triangles
from flame_ros_tpu.ops import epipolar as ep_ops
from flame_ros_tpu.ops import nltgv2 as reg_ops
from flame_ros_tpu.ops import raster as raster_ops
from flame_ros_tpu.ops.detection import detect_features, occupancy_from_features
from flame_ros_tpu.ops.pyramid import build_pyramid, bilinear_pyramid
from flame_ros_tpu.utils.stats_tracker import StatsTracker

NUM_LEVELS = 3
# Deferred-triangulation pipeline depth: how many poseframes' topology
# round-trips (D2H + host Delaunay + H2D) may be in flight before
# scheduling a new one blocks. Depth 2 hides one full round-trip behind
# two poseframe periods of compute on high-latency links.
_MAX_TRI_INFLIGHT = 2


@partial(jax.jit, static_argnames=("cam",))
def _ZERO_IMG(cam: Pinhole):
    return jnp.zeros((cam.height, cam.width), jnp.float32)


class EngineState(NamedTuple):
    """Complete device-resident engine state (a pytree)."""
    # Feature filter lanes [N].
    feat: ep_ops.FeatureFilterState
    # Graph primal/dual state.
    vtx_uv: jax.Array       # [N, 2] vertex positions in current frame
    vtx_x: jax.Array        # [N] smoothed idepth (current frame)
    vtx_w: jax.Array        # [N, 2] plane gradients
    vtx_z: jax.Array        # [N] data-term anchor (projected filter mean)
    vtx_in_graph: jax.Array  # [N] bool
    edge_q: jax.Array       # [E, 3] duals
    edges: jax.Array        # [E, 2] int32
    edge_valid: jax.Array   # [E] bool
    inc_edges: jax.Array    # [N, D] int32 vertex->edge incidence
    inc_sign: jax.Array     # [N, D] float32 (+1 tail / -1 head / 0 pad)
    tris: jax.Array         # [T, 3] int32
    tri_valid: jax.Array    # [T] bool
    # Keyframe (poseframe) ring.
    kf_pyrs: jax.Array      # [K, L, H, W]
    kf_q: jax.Array         # [K, 4]
    kf_t: jax.Array         # [K, 3]
    kf_valid: jax.Array     # [K] bool
    kf_ids: jax.Array       # [K] int32 (frame id of each poseframe)
    # Previous processed frame (for project_graph).
    prev_q: jax.Array       # [4]
    prev_t: jax.Array       # [3]
    # Last raster products (prediction source for new detections; the
    # dense idepth map evaluates lazily at getter/eval time —
    # raster.idepth_from_ids — saving ~1.9 ms/frame on v5e).
    last_idmap: jax.Array   # [H, W] int32 triangle ids (-1 uncovered)
    last_planes: jax.Array  # [T, 3] affine idepth planes
    # Per-detection-cell mean abs photometric error of the previous frame
    # (min_error redetection: occupied cells whose mesh no longer explains
    # the image re-open for detection, reference features/detection/
    # min_error, cfg/flame_nodelet.yaml:70).
    cell_err: jax.Array     # [nCy, nCx] float32
    # Frame-id watermark of the installed topology: triangles whose
    # vertex slots were re-detected AFTER the triangulation (frame_id >
    # watermark) or whose vertices died are stale — their corners no
    # longer belong to the surface the triangle was built over. They are
    # masked out of the raster until the next install (correctness: a
    # recycled slot's new feature sits at an unrelated pixel; perf: the
    # jumped corners create spurious long-extent triangles that blow the
    # Pallas raster's exact-candidate budgets and trip its in-graph v2
    # fallback, measured several ms/frame).
    topo_frame_id: jax.Array  # [] int32


def init_state(params: FlameParams, cam: Pinhole) -> EngineState:
    N = params.engine.max_features
    E = params.engine.max_edges
    T = params.engine.max_triangles
    K = params.engine.max_keyframes
    H, W = cam.height, cam.width
    f32 = jnp.float32
    feat = ep_ops.FeatureFilterState(
        uv_ref=jnp.zeros((N, 2), f32),
        kf_idx=jnp.zeros((N,), jnp.int32),
        mu=jnp.full((N,), 0.5, f32),
        var=jnp.full((N,), params.engine.init_idepth_var, f32),
        dropouts=jnp.zeros((N,), jnp.int32),
        valid=jnp.zeros((N,), bool),
        frame_id=jnp.zeros((N,), jnp.int32),
    )
    return EngineState(
        feat=feat,
        vtx_uv=jnp.zeros((N, 2), f32),
        vtx_x=jnp.full((N,), 0.5, f32),
        vtx_w=jnp.zeros((N, 2), f32),
        vtx_z=jnp.full((N,), 0.5, f32),
        vtx_in_graph=jnp.zeros((N,), bool),
        edge_q=jnp.zeros((E, 3), f32),
        edges=jnp.zeros((E, 2), jnp.int32),
        edge_valid=jnp.zeros((E,), bool),
        inc_edges=jnp.zeros((N, params.engine.max_vertex_degree),
                            jnp.int32),
        inc_sign=jnp.zeros((N, params.engine.max_vertex_degree), f32),
        tris=jnp.zeros((T, 3), jnp.int32),
        tri_valid=jnp.zeros((T,), bool),
        kf_pyrs=jnp.zeros((K, NUM_LEVELS, H, W), f32),
        kf_q=jnp.tile(jnp.array([1.0, 0, 0, 0], f32), (K, 1)),
        kf_t=jnp.zeros((K, 3), f32),
        kf_valid=jnp.zeros((K,), bool),
        kf_ids=jnp.full((K,), -1, jnp.int32),
        prev_q=jnp.array([1.0, 0, 0, 0], f32),
        prev_t=jnp.zeros((3,), f32),
        last_idmap=jnp.full((H, W), -1, jnp.int32),
        last_planes=jnp.zeros((params.engine.max_triangles, 3), f32),
        cell_err=jnp.zeros((H // params.features.detection.win_size,
                            W // params.features.detection.win_size), f32),
        topo_frame_id=jnp.int32(2 ** 30),
    )


def _masked_median(vals, mask, fallback):
    """Median of vals[mask] (device-friendly sort-based), or fallback."""
    big = jnp.where(mask, vals, jnp.inf)
    s = jnp.sort(big)
    n = jnp.sum(mask.astype(jnp.int32))
    med = s[jnp.clip(n // 2, 0, vals.shape[0] - 1)]
    return jnp.where(n > 0, med, fallback)


META_LEN = 10  # q4 + t3 + frame_id + is_pf + kf_slot, little-endian f32


def pack_frame_meta(quat, trans, frame_id: int, is_pf: bool,
                    kf_slot: int) -> np.ndarray:
    """40-byte frame metadata blob appended to the image bytes so a whole
    frame (or window of frames) ships in ONE H2D transfer — each separate
    host->device put costs ~30 ms of latency over a tunneled PJRT link."""
    return np.concatenate([
        np.asarray(quat, np.float32).ravel(),
        np.asarray(trans, np.float32).ravel(),
        np.asarray([frame_id, 1.0 if is_pf else 0.0, kf_slot], np.float32),
    ]).view(np.uint8)


@partial(jax.jit, static_argnames=("cam", "params", "has_gt",
                                   "first_is_pf"))
def _window_step(state: EngineState, packed, gt_batch, *, cam: Pinhole,
                 params: FlameParams, has_gt: bool, first_is_pf: bool):
    """B frames in ONE dispatch over packed rows of
    [H*W image bytes | 40 meta bytes]. Windows are poseframe-ALIGNED: a
    poseframe may only be the first frame, which is unrolled with a
    static branch; the remaining frames scan with no branch at all. The
    host retriangulates between windows (FLaME-style stale topology)."""
    H, W = cam.height, cam.width

    def one_frame(st, row, gt, is_pf):
        img = row[:H * W].reshape(H, W).astype(jnp.float32)
        meta = jax.lax.bitcast_convert_type(
            row[H * W:].reshape(META_LEN, 4), jnp.float32)
        cur_q = meta[:4]
        cur_t = meta[4:7]
        frame_id = meta[7].astype(jnp.int32)
        kf_slot = meta[9].astype(jnp.int32)
        img_pyr = build_pyramid(img, NUM_LEVELS)
        st, status, uv_match, counts_vec, dets = _track_step.__wrapped__(
            st, img_pyr, cur_q, cur_t, frame_id, kf_slot, is_pf,
            _ZERO_IMG(cam), cam=cam, params=params, use_truth=False)
        st, idepth, stats_vec = _smooth_step.__wrapped__(
            st, img_pyr, cur_q, cur_t, counts_vec, gt,
            cam=cam, params=params, has_gt=has_gt)
        return st, (status, uv_match, stats_vec, dets)

    B = packed.shape[0]
    # Unroll: B is small and static; an unrolled graph lets XLA fuse
    # across frames (lax.scan adds carry copies and blocks fusion — it
    # measured slower per frame than unrolled single dispatches).
    frame_outs = []
    for b in range(B):
        state, out_b = one_frame(state, packed[b], gt_batch[b],
                                 first_is_pf if b == 0 else False)
        frame_outs.append(out_b)
    outs = jax.tree.map(lambda *xs: jnp.stack(xs), *frame_outs)
    statuses, uv_matches, stats, dets = outs
    return state, statuses, uv_matches, stats, dets


def _ring_insert(state: EngineState, img_pyr, cur_q, cur_t, frame_id,
                 kf_slot):
    """Write the new poseframe into the keyframe ring (slot updates of
    the pyramid/pose/id buffers)."""
    return (state.kf_pyrs.at[kf_slot].set(img_pyr),
            state.kf_q.at[kf_slot].set(cur_q),
            state.kf_t.at[kf_slot].set(cur_t),
            state.kf_valid.at[kf_slot].set(True),
            state.kf_ids.at[kf_slot].set(frame_id))


def _project_graph_core(state: EngineState, cur_q, cur_t, cam: Pinhole):
    """Transform last frame's smoothed vertex idepth into the current
    frame (the reference's project_graph stage): vertex positions track
    the projected features; the primal value warm-starts from its
    reprojection. Returns (x_proj [N], graph_ok [N])."""
    qc = quat_conj(cur_q)
    q_cp = quat_mul(qc, state.prev_q)
    t_cp = quat_rotate(qc, state.prev_t - cur_t)
    ray_prev = cam.ray(state.vtx_uv)
    xprev = jnp.maximum(state.vtx_x, 1e-6)
    X_c = quat_rotate(q_cp[None, :], ray_prev) / xprev[:, None] + t_cp[None, :]
    x_proj = 1.0 / jnp.maximum(X_c[..., 2], 1e-6)
    graph_ok = state.vtx_in_graph & (X_c[..., 2] > 1e-6)
    return x_proj, graph_ok


@partial(jax.jit, static_argnames=("cam", "params", "use_truth"))
def _track_step(state: EngineState, img_pyr, cur_q, cur_t, frame_id,
                kf_slot, is_poseframe, truth_idepth, *, cam: Pinhole,
                params: FlameParams, use_truth: bool):
    """Fused device computation up to the (optional) triangulation sync:
    epipolar update -> graph/feature projection -> on poseframes (traced
    lax.cond branch): keyframe ring insert + detection + free-slot
    allocation. `is_poseframe`, `kf_slot` and `frame_id` are device values
    so multi-frame windows compile into one executable."""
    eng = params.engine
    trk = params.features.tracking
    det = params.features.detection
    reg = params.regularization.nltgv2
    feat = state.feat

    # --- update_idepths (epipolar + Bayes filter) ---------------------
    res = ep_ops.epipolar_update(
        feat, state.kf_pyrs, state.kf_q, state.kf_t, img_pyr, cur_q, cur_t,
        cam=cam,
        num_samples=eng.num_search_samples,
        patch_size=trk.win_size,
        num_levels=NUM_LEVELS,
        sigma_window=eng.sigma_window,
        idepth_min=eng.idepth_min,
        idepth_max=eng.idepth_max,
        epipolar_line_var=trk.epipolar_line_var,
        min_ref_patch_grad=eng.min_ref_patch_grad,
        ambiguous_match_ratio=eng.ambiguous_match_ratio,
        max_cost=eng.max_cost,
        max_dropouts=trk.max_dropouts,
        max_idepth_var=trk.max_idepth_var,
        gather_dtype=eng.compute_dtype,
        mode=eng.epipolar_mode,
        zero_mean_ssd=eng.zero_mean_ssd,
    )
    feat = res.state

    if use_truth:
        # Truth-injection harness (reference analysis/pass_in_truth,
        # src/flame_offline_tum.cc:577-595): override the filter posterior
        # with GT idepth sampled at the reference pixel (projected to the
        # current frame below like any measurement).
        # The truth map is in the CURRENT frame; sample it at each
        # feature's projected position, then convert to ref-frame idepth.
        tmap_pyr = jnp.concatenate(
            [truth_idepth[None],
             jnp.zeros((NUM_LEVELS - 1,) + truth_idepth.shape,
                       truth_idepth.dtype)])
        uv_c, _, inb_c = ep_ops.project_features(
            feat, state.kf_q, state.kf_t, cur_q, cur_t, cam)
        tvals, tok = bilinear_pyramid(
            tmap_pyr, uv_c, jnp.zeros_like(feat.kf_idx))
        good = tok & inb_c & (tvals > 0) & feat.valid
        # Convert current-frame truth idepth to ref-frame idepth.
        q_rc = quat_mul(quat_conj(state.kf_q[feat.kf_idx]), cur_q)
        t_rc = quat_rotate(quat_conj(state.kf_q[feat.kf_idx]),
                           cur_t - state.kf_t[feat.kf_idx])
        ray_c = cam.ray(uv_c)
        X_ref = (quat_rotate(q_rc, ray_c)
                 / jnp.maximum(tvals, 1e-6)[:, None] + t_rc)
        xi_ref = 1.0 / jnp.maximum(X_ref[..., 2], 1e-6)
        feat = feat._replace(
            mu=jnp.where(good, xi_ref, feat.mu),
            var=jnp.where(good, 1e-6, feat.var))

    # --- project_features ---------------------------------------------
    uv_cur, z_cur, inb = ep_ops.project_features(
        feat, state.kf_q, state.kf_t, cur_q, cur_t, cam)

    # --- project_graph -------------------------------------------------
    x_proj, graph_ok = _project_graph_core(state, cur_q, cur_t, cam)
    vtx_x = jnp.where(graph_ok, x_proj, z_cur)
    vtx_uv = uv_cur

    counts = dict(res.counts)
    n_cells = ((cam.height // det.win_size) * (cam.width // det.win_size))

    # --- poseframe branch (traced: lax.cond takes only the live branch,
    # so whole multi-frame windows compile into ONE dispatch) -----------
    def _pf_branch(op):
        feat, vtx_uv, vtx_x = op
        # Keyframe ring recycling. Features anchored to the recycled
        # slot lose their reference imagery; there are two policies:
        #
        # evict (reanchor_on_evict=False): kill them. Measured failure
        # mode (round 5, streaming-accuracy runner): the recycled slot
        # owns the LONGEST-LIVED cohort — the best features — and its
        # mass death forces a redetection wave whose window-lagged
        # topology masks 60-90% of the dense map for ~4 poseframe
        # periods (coverage 0.83 -> 0.10 -> recover, every ring wrap).
        #
        # re-anchor (default): transform each such feature to the
        # NEWEST surviving keyframe — project its backprojected 3D
        # point into that frame, carry idepth (variance scaled by the
        # Jacobian (mu'/mu)^2 and floored by the init prior — the new
        # reference patch is resampled imagery, not the original
        # detection), keep its graph vertex and frame_id (the GEOMETRY
        # did not change, so mesh freshness survives). Features that
        # fall outside the new frame or out of the idepth bounds still
        # die. The reference has no analog (its poseframe window is
        # pruned externally, flame_nodelet.cc:473-476).
        doomed = (feat.valid & (feat.kf_idx == kf_slot)
                  & state.kf_valid[kf_slot])
        if eng.reanchor_on_evict:
            K = state.kf_q.shape[0]
            ids_masked = jnp.where(
                state.kf_valid & (jnp.arange(K) != kf_slot),
                state.kf_ids, -1)
            j_new = jnp.argmax(ids_masked)
            has_target = ids_masked[j_new] >= 0
            qA = state.kf_q[kf_slot]
            tA = state.kf_t[kf_slot]
            qB = state.kf_q[j_new]
            tB = state.kf_t[j_new]
            X_A = cam.backproject(feat.uv_ref,
                                  jnp.maximum(feat.mu, eng.idepth_min))
            X_w = quat_rotate(qA[None, :], X_A) + tA[None, :]
            X_B = quat_rotate(quat_conj(qB)[None, :], X_w - tB[None, :])
            z_B = X_B[..., 2]
            zs = jnp.where(z_B > 1e-6, z_B, 1.0)
            u_B = cam.fx * X_B[..., 0] / zs + cam.cx
            v_B = cam.fy * X_B[..., 1] / zs + cam.cy
            mu_B = 1.0 / zs
            pad = 4.0   # patch half-width margin
            ok = (has_target & (z_B > 1e-6)
                  & (u_B >= pad) & (u_B <= cam.width - 1 - pad)
                  & (v_B >= pad) & (v_B <= cam.height - 1 - pad)
                  & (mu_B >= eng.idepth_min) & (mu_B <= eng.idepth_max))
            # Keep only the CONVERGED cohort (the graph-insertion gate
            # doubles as "worth carrying"): re-anchoring everything
            # starved detection of free slots for newly revealed image
            # regions as the camera moves (measured: dense coverage
            # 0.935 -> 0.843 on the VGA/200 easy regime when every
            # doomed feature was carried; unconverged features are
            # cheaper to re-detect than to drag across anchors).
            move = doomed & ok & (feat.var < reg.idepth_var_max)
            ratio = mu_B / jnp.maximum(feat.mu, 1e-6)
            # Jacobian-scaled variance, DOUBLED for the resampled
            # reference patch — but no absolute floor: flooring at the
            # init prior (0.125) threw every re-anchored feature out of
            # the graph-insertion gate (idepth_var_max 0.01) until its
            # filter re-converged, measured as a 5 pp recall dip on the
            # VGA/200 easy regimes.
            var_B = feat.var * jnp.square(ratio) * 2.0
            feat = feat._replace(
                uv_ref=jnp.where(move[:, None],
                                 jnp.stack([u_B, v_B], -1),
                                 feat.uv_ref),
                kf_idx=jnp.where(move, j_new, feat.kf_idx),
                mu=jnp.where(move, mu_B, feat.mu),
                var=jnp.where(move, var_B, feat.var),
                dropouts=jnp.where(move, 0, feat.dropouts),
                valid=feat.valid & ~(doomed & ~move))
        else:
            feat = feat._replace(valid=feat.valid & ~doomed)
        kf_pyrs, kf_q, kf_t, kf_valid, kf_ids = _ring_insert(
            state, img_pyr, cur_q, cur_t, frame_id, kf_slot)

        # Detection on free grid cells. min_error redetection: an occupied
        # cell whose mesh no longer explains the image (mean abs photo
        # error above min_error, from the previous frame's stride-2 photo
        # pass) re-opens for detection (reference features/detection/
        # min_error, cfg/flame_nodelet.yaml:70).
        occ = occupancy_from_features(uv_cur, feat.valid & inb,
                                      cam.height, cam.width,
                                      det.win_size)
        occ = occ & ~(state.cell_err > det.min_error)
        duv, dscore, dvalid = detect_features(
            img_pyr[0], occ, win_size=det.win_size,
            min_grad_mag=det.min_grad_mag,
            do_letterbox=params.features.do_letterbox)

        # Allocation: k-th new detection -> k-th free slot. Rank matching
        # via cumsums — no argsort (TPU sorts are cross-lane-shuffle
        # heavy) and no materialized index vectors.
        free = ~feat.valid
        det_rank = jnp.cumsum(dvalid.astype(jnp.int32)) - 1
        free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1
        n_free = jnp.sum(free.astype(jnp.int32))
        take = dvalid & (det_rank < n_free)
        # Initial idepth: dense prediction at the pixel if available, else
        # the median of currently-converged features (reference
        # init_with_prediction semantics, cfg nltgv2/init_with_prediction).
        med = _masked_median(
            feat.mu, feat.valid & (feat.var < reg.idepth_var_max),
            jnp.float32(eng.init_idepth))
        pred, pok = raster_ops.sample_idepth_at(
            state.last_idmap, state.last_planes, duv)
        use_pred = (reg.init_with_prediction
                    & pok & jnp.isfinite(pred) & (pred > eng.idepth_min))
        mu0 = jnp.where(use_pred, jnp.nan_to_num(pred, nan=0.5), med)
        var0 = jnp.where(use_pred, eng.init_idepth_var * 0.5,
                         eng.init_idepth_var)

        # Slot assignment WITHOUT scatters or sorts: slot n receives
        # detection d iff both have the same rank (n-th free slot, d-th
        # valid detection) — a one-hot [N, n_cells] rank-match product
        # recovers per-slot values exactly (each row has at most one hit).
        # TPU scatters with runtime indices serialize; this fuses into
        # one MXU op.
        oh = (free[:, None] & take[None, :]
              & (free_rank[:, None] == det_rank[None, :]))
        hit = jnp.any(oh, axis=1)                      # [N]
        vals = jnp.stack([duv[:, 0], duv[:, 1], mu0, var0], -1)
        # HIGHEST: vals carries pixel coordinates — at DEFAULT precision
        # the TPU MXU truncates them to bf16 (a 4-px grid at u >= 512).
        got = jnp.dot(oh.astype(jnp.float32), vals,
                      precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)  # [N, 4]
        feat = feat._replace(
            uv_ref=jnp.where(hit[:, None], got[:, :2], feat.uv_ref),
            kf_idx=jnp.where(hit, kf_slot, feat.kf_idx),
            mu=jnp.where(hit, got[:, 2], feat.mu),
            var=jnp.where(hit, got[:, 3], feat.var),
            dropouts=jnp.where(hit, 0, feat.dropouts),
            valid=feat.valid | hit,
            frame_id=jnp.where(hit, frame_id, feat.frame_id),
        )
        n_det = jnp.sum(take.astype(jnp.int32))
        # New features appear at their own pixel with their init idepth.
        vtx_uv = jnp.where(hit[:, None], got[:, :2], vtx_uv)
        vtx_x = jnp.where(hit, got[:, 2], vtx_x)
        # (vtx_w rows for new slots are stale; the regularizer re-estimates
        # them within a few sweeps.)
        uv2, z2, inb2 = ep_ops.project_features(
            feat, kf_q, kf_t, cur_q, cur_t, cam)
        vtx_uv = jnp.where(feat.valid[:, None], uv2, vtx_uv)
        return (feat, vtx_uv, vtx_x, kf_pyrs, kf_q, kf_t, kf_valid,
                kf_ids, uv2, z2, inb2, n_det, duv, take)

    def _no_pf(op):
        feat, vtx_uv, vtx_x = op
        return (feat, vtx_uv, vtx_x, state.kf_pyrs, state.kf_q,
                state.kf_t, state.kf_valid, state.kf_ids,
                uv_cur, z_cur, inb, jnp.zeros((), jnp.int32),
                jnp.zeros((n_cells, 2), jnp.float32),
                jnp.zeros((n_cells,), bool))

    # Python-bool poseframe flags take the branch at trace time (windows
    # are poseframe-aligned, so the compiled graph has no cond at all);
    # traced flags fall back to lax.cond.
    if isinstance(is_poseframe, (bool, np.bool_)):
        branch = _pf_branch if is_poseframe else _no_pf
        (feat, vtx_uv, vtx_x, kf_pyrs, kf_q, kf_t, kf_valid, kf_ids,
         uv_cur, z_cur, inb, n_detected, det_uv, det_take) = branch(
            (feat, vtx_uv, vtx_x))
    else:
        (feat, vtx_uv, vtx_x, kf_pyrs, kf_q, kf_t, kf_valid, kf_ids,
         uv_cur, z_cur, inb, n_detected, det_uv, det_take) = jax.lax.cond(
            is_poseframe, _pf_branch, _no_pf, (feat, vtx_uv, vtx_x))
    detections = (det_uv, det_take)

    # --- graph eligibility ---------------------------------------------
    # Height gate (reference min_height/max_height): world-frame height of
    # the feature's 3D point. RDF world: +y is down, "height" = -y.
    X_cur_cam = cam.backproject(uv_cur, jnp.maximum(z_cur, 1e-6))
    X_w = quat_rotate(cur_q[None, :], X_cur_cam) + cur_t[None, :]
    height = -X_w[..., 1]
    height_ok = (height >= reg.min_height) & (height <= reg.max_height)
    in_graph = (feat.valid & inb & height_ok
                & (feat.var <= reg.idepth_var_max))

    new_state = state._replace(
        feat=feat, vtx_uv=vtx_uv, vtx_x=vtx_x, vtx_z=z_cur,
        vtx_in_graph=in_graph,
        kf_pyrs=kf_pyrs, kf_q=kf_q, kf_t=kf_t, kf_valid=kf_valid,
        kf_ids=kf_ids, prev_q=cur_q, prev_t=cur_t)
    # Pack counters into one small device vector (COUNT_KEYS order) so the
    # host never syncs on individual scalars.
    counts_vec = jnp.stack([
        counts["num_idepth_updates"].astype(jnp.float32),
        counts["num_fail_ref_patch_grad"].astype(jnp.float32),
        counts["num_fail_ambiguous_match"].astype(jnp.float32),
        counts["num_fail_max_cost"].astype(jnp.float32),
        counts["num_fail_max_dropouts"].astype(jnp.float32),
        counts["num_fail_max_var"].astype(jnp.float32),
        n_detected.astype(jnp.float32),
    ])
    return new_state, res.status, res.uv_match, counts_vec, detections


# Fixed layout of the per-frame device stats vector. ONE small D2H pull
# recovers all frame telemetry — individual scalar pulls cost ~30 ms each
# over a tunneled PJRT link, and a dense-map pull costs seconds.
DEVICE_STATS_KEYS = (
    "num_feats", "num_vtx", "num_tris", "num_edges", "coverage",
    "num_idepth_updates", "num_fail_ref_patch_grad",
    "num_fail_ambiguous_match", "num_fail_max_cost",
    "num_fail_max_dropouts", "num_fail_max_var", "num_detections",
    "nltgv2_total_smoothness_cost", "nltgv2_avg_smoothness_cost",
    "nltgv2_total_data_cost", "nltgv2_avg_data_cost",
    "total_photo_error", "avg_photo_error",
    # GT-evaluation block (-1 when no ground truth this frame):
    "true_pos", "true_neg", "false_pos", "false_neg",
    "total_idepth_error", "idepth_rmse",
    # Device health word: 1.0 = engine state finite, 0.0 = divergence
    # detected (non-finite primal/posterior). Checked at the existing
    # telemetry sync points; a 0 makes the next update() fail + recover
    # (reference: update() returns false on real tracking failure,
    # src/flame_nodelet.cc:637-642).
    "health",
)


def _smooth_pd_setup(state: EngineState, *, params: FlameParams):
    """Per-frame masks + data weights feeding the NLTGV2 sweep. Shared by
    the fused single-device path (_smooth_step) and the spatially sharded
    multi-stream path (parallel/multi_stream.batched_full_step_spatial),
    so both see the identical edge set and data term.

    Stale-topology gate (see EngineState.topo_frame_id): a slot
    re-detected AFTER the topology install is a different feature at an
    unrelated pixel — triangles/edges referencing it are masked until
    the next install. Dead-but-unrecycled slots keep rendering (their
    projected ghost geometry is the established FLaME stale-mesh
    behavior); only identity changes are poisonous, both for geometry
    and for the Pallas raster's candidate budgets (a jumped corner
    creates spurious long-extent triangles that trip the in-graph v2
    fallback, costing several ms/frame)."""
    nl = params.regularization.nltgv2
    v_same = state.feat.frame_id <= state.topo_frame_id
    tri_fresh = state.tri_valid & v_same[state.tris].all(-1)
    edge_fresh = state.edge_valid & v_same[state.edges].all(-1)
    lam = reg_ops.data_weights(
        state.feat.var, state.vtx_in_graph,
        data_factor=nl.data_factor,
        adaptive=nl.adaptive_data_weights,
        rescale=nl.rescale_data)
    return tri_fresh, edge_fresh, lam


@partial(jax.jit, static_argnames=("cam", "params", "has_gt",
                                   "dense_products"))
def _smooth_step(state: EngineState, img_pyr, cur_q, cur_t, track_counts,
                 gt_depth, *, cam: Pinhole, params: FlameParams,
                 has_gt: bool = False, dense_products: bool = False):
    """Fused device computation after (optional) retriangulation: NLTGV2
    sweeps, rasterization, photometric error, coverage, and (optionally)
    the ground-truth confusion matrix — all telemetry packed into one
    DEVICE_STATS_KEYS vector so the host syncs at most once per frame."""
    reg = params.regularization
    nl = reg.nltgv2
    eng = params.engine

    vtx_x, vtx_w, edge_q = state.vtx_x, state.vtx_w, state.edge_q
    tri_fresh, edge_fresh, lam = _smooth_pd_setup(state, params=params)
    costs = {}
    if reg.do_nltgv2:
        top = reg_ops.build_topology(state.edges, edge_fresh,
                                     state.vtx_uv,
                                     inc_edges=state.inc_edges,
                                     inc_sign=state.inc_sign)
        gs = reg_ops.GraphState(x=vtx_x, w=vtx_w, q=edge_q,
                                x_bar=vtx_x, w_bar=vtx_w)
        # MXU adjoint (TPU default): K^T as one matmul per sweep against
        # the incidence matrix. Built per frame from the current edge
        # set; hoisting it to install time in EngineState was measured a
        # NO-OP on v5e (chain 6.49 vs 6.48 ms/frame — the scatter build
        # is bandwidth-trivial) while costing [N, 2E] bf16 of state, so
        # the per-frame build stays (BENCH_NOTES round 3).
        gcat = (reg_ops.build_gcat(state.edges, edge_fresh,
                                   state.vtx_x.shape[0])
                if eng.nltgv2_adjoint == "matmul" else None)
        gs = reg_ops.pd_iterate(
            gs, top, state.vtx_z, lam, state.vtx_in_graph, gcat,
            num_iters=eng.pd_iters_per_frame,
            step_x=nl.step_x, step_q=nl.step_q, theta=nl.theta,
            gate_tol=eng.pd_gate_tol)
        costs = reg_ops.nltgv2_costs(gs, top, state.vtx_z, lam,
                                     state.vtx_in_graph)
        vtx_x, vtx_w, edge_q = gs.x, gs.w, gs.q
    else:
        vtx_x = jnp.where(state.vtx_in_graph, state.vtx_z, vtx_x)
    return _smooth_finish(
        state, img_pyr, cur_q, cur_t, track_counts, gt_depth,
        vtx_x, vtx_w, edge_q, costs, tri_fresh, edge_fresh,
        cam=cam, params=params, has_gt=has_gt,
        dense_products=dense_products)


def _smooth_finish(state: EngineState, img_pyr, cur_q, cur_t, track_counts,
                   gt_depth, vtx_x, vtx_w, edge_q, costs, tri_fresh,
                   edge_fresh, *, cam: Pinhole, params: FlameParams,
                   has_gt: bool, dense_products: bool):
    """Everything after the NLTGV2 sweep: graph filters, sticky-obstacle
    guard, rasterization, photometric telemetry, health word, packed
    stats. Factored out so the spatially sharded sweep
    (parallel/multi_stream.py) re-enters the identical tail."""
    reg = params.regularization
    nl = reg.nltgv2
    eng = params.engine

    if reg.do_median_filter:
        vtx_x = reg_ops.graph_median(vtx_x, state.inc_edges,
                                     state.inc_sign, state.edges,
                                     state.vtx_in_graph)
    if reg.do_lowpass_filter:
        vtx_x = reg_ops.graph_lowpass(vtx_x, state.edges, edge_fresh,
                                      state.vtx_in_graph)

    if nl.check_sticky_obstacles:
        # "Sticky obstacle" guard (reference cfg regularization/nltgv2/
        # check_sticky_obstacles, parsed at src/flame_nodelet.cc:262-263;
        # the core's formulation is not on disk, so this is our device-side
        # semantics): smoothing must not hold geometry in front of the
        # camera that the measurements do not support. A vertex whose
        # smoothed idepth claims an obstacle within 2 m (x > 0.5) while
        # sitting at more than twice its data anchor snaps back to the
        # anchor, so phantom near-field surfaces cannot stick.
        sticky = (state.vtx_in_graph & (vtx_x > 0.5)
                  & (vtx_x > 2.0 * jnp.maximum(state.vtx_z, 1e-6)))
        vtx_x = jnp.where(sticky, state.vtx_z, vtx_x)

    # --- rasterize ------------------------------------------------------
    # Per-frame products are the id buffer + planes; the DENSE idepth
    # evaluation (a 307k gather, ~1.9 ms on v5e) is deferred to getter/
    # eval time unless this step itself consumes it (GT confusion, or a
    # caller that wants the dense map returned).
    idmap, planes = raster_ops.rasterize_ids(
        state.vtx_uv, vtx_x, state.tris, tri_fresh,
        height=cam.height, width=cam.width,
        use_pallas=eng.use_pallas_raster,
        pallas_kernel=eng.pallas_raster_kernel)
    cov = jnp.mean((idmap >= 0).astype(jnp.float32))
    if has_gt or dense_products:
        idepth_map = raster_ops.idepth_from_ids(idmap, planes)
    else:
        idepth_map = None

    # --- photometric error (vs most recent keyframe) -------------------
    # Telemetry stat (reference publishes per-frame photo error). Sampled
    # on a strided grid (engine.photo_stride): a strided subsample
    # estimates the same mean, and the dense 307k-element warp gather was
    # the most expensive part of this step at VGA (the stride-2 grid
    # still cost ~3.5 ms/frame on v5e — random gathers dominate). The
    # total is rescaled to dense-equivalent.
    ps = max(int(eng.photo_stride), 1)
    kf_slot = jnp.argmax(state.kf_ids)  # newest poseframe
    hs, ws = cam.height // ps, cam.width // ps
    u = jax.lax.broadcasted_iota(jnp.float32, (hs, ws), 1) * float(ps)
    v = jax.lax.broadcasted_iota(jnp.float32, (hs, ws), 0) * float(ps)
    sidx = (v * cam.width + u).astype(jnp.int32)
    ids_s = jnp.take(idmap.reshape(-1), sidx)
    g_s = planes[jnp.clip(ids_s, 0)]
    xi = g_s[..., 0] + g_s[..., 1] * u + g_s[..., 2] * v
    xi = jnp.where(ids_s >= 0, xi, 0.0)
    img_s = jnp.take(img_pyr[0].reshape(-1), sidx)
    ok = (ids_s >= 0) & (xi > 1e-3)
    X = cam.backproject(jnp.stack([u, v], -1), jnp.maximum(xi, 1e-3))
    q_kc = quat_mul(quat_conj(state.kf_q[kf_slot]), cur_q)
    t_kc = quat_rotate(quat_conj(state.kf_q[kf_slot]),
                       cur_t - state.kf_t[kf_slot])
    X_kf = quat_rotate(q_kc[None, None, :], X) + t_kc[None, None, :]
    behind = X_kf[..., 2] <= 1e-6
    uv_kf = cam.project(jnp.where(behind[..., None],
                                  jnp.array([0.0, 0.0, 1.0]), X_kf))
    kf_img = state.kf_pyrs[kf_slot, 0]
    from flame_ros_tpu.ops.interp import bilinear
    vals, samp_ok = bilinear(kf_img, uv_kf)
    perr = jnp.abs(vals - img_s)
    pmask = ok & samp_ok & ~behind
    total_photo = float(ps * ps) * jnp.sum(jnp.where(pmask, perr, 0.0))
    n_photo = jnp.maximum(jnp.sum(pmask.astype(jnp.float32)), 1.0)

    # Per-detection-cell mean abs photo error from the same strided
    # samples (consumed next poseframe for min_error redetection).
    dw = params.features.detection.win_size
    nCy, nCx = cam.height // dw, cam.width // dw
    if dw % ps == 0:
        s2 = dw // ps
        e_c = jnp.where(pmask, perr, 0.0)[:nCy * s2, :nCx * s2]
        m_c = pmask[:nCy * s2, :nCx * s2].astype(jnp.float32)
        e_c = e_c.reshape(nCy, s2, nCx, s2).sum((1, 3))
        m_c = m_c.reshape(nCy, s2, nCx, s2).sum((1, 3))
    else:  # win_size not divisible by stride: scatter-mean (rare)
        cyi = jnp.clip((v / dw).astype(jnp.int32), 0, nCy - 1)
        cxi = jnp.clip((u / dw).astype(jnp.int32), 0, nCx - 1)
        e_c = jnp.zeros((nCy, nCx), jnp.float32).at[cyi, cxi].add(
            jnp.where(pmask, perr, 0.0))
        m_c = jnp.zeros((nCy, nCx), jnp.float32).at[cyi, cxi].add(
            pmask.astype(jnp.float32))
    cell_err = e_c / jnp.maximum(m_c, 1.0)

    # Device health word: any non-finite primal/posterior/pose marks the
    # state as diverged. One fused all-reduce; costs nothing next to the
    # raster.
    health = (jnp.isfinite(vtx_x).all()
              & jnp.isfinite(state.feat.mu).all()
              & jnp.isfinite(state.feat.var).all()
              & jnp.isfinite(cur_q).all()
              & jnp.isfinite(cur_t).all()).astype(jnp.float32)

    zero = jnp.float32(0.0)
    if has_gt:
        from flame_ros_tpu.eval.metrics import (depth_confusion_matrix,
                                                idepth_rmse)
        cm = depth_confusion_matrix.__wrapped__(idepth_map, gt_depth)
        gt_block = [cm["true_pos"].astype(jnp.float32),
                    cm["true_neg"].astype(jnp.float32),
                    cm["false_pos"].astype(jnp.float32),
                    cm["false_neg"].astype(jnp.float32),
                    cm["total_error"],
                    idepth_rmse.__wrapped__(idepth_map, gt_depth)]
    else:
        gt_block = [jnp.float32(-1.0)] * 6

    stats_vec = jnp.stack([
        jnp.sum(state.feat.valid.astype(jnp.float32)),
        jnp.sum(state.vtx_in_graph.astype(jnp.float32)),
        jnp.sum(state.tri_valid.astype(jnp.float32)),
        jnp.sum(state.edge_valid.astype(jnp.float32)),
        cov,
        track_counts[0], track_counts[1], track_counts[2],
        track_counts[3], track_counts[4], track_counts[5], track_counts[6],
        costs.get("nltgv2_total_smoothness_cost", zero),
        costs.get("nltgv2_avg_smoothness_cost", zero),
        costs.get("nltgv2_total_data_cost", zero),
        costs.get("nltgv2_avg_data_cost", zero),
        total_photo,
        total_photo / n_photo,
        *gt_block,
        health,
    ])
    new_state = state._replace(vtx_x=vtx_x, vtx_w=vtx_w, edge_q=edge_q,
                               last_idmap=idmap, last_planes=planes,
                               cell_err=cell_err)
    idepth_out = (idepth_map if (has_gt or dense_products)
                  else jnp.zeros((0,), jnp.float32))
    return new_state, idepth_out, stats_vec


@jax.jit
def _sanitize_state(state: EngineState) -> EngineState:
    """Divergence recovery: kill feature lanes / graph vertices / keyframes
    whose numeric state went non-finite and restore safe defaults in their
    slots, so the engine continues over the failure (reference semantics:
    a failed update() skips the frame, the system continues,
    src/flame_nodelet.cc:637-642)."""
    f = state.feat
    ffin = (jnp.isfinite(f.mu) & jnp.isfinite(f.var)
            & jnp.isfinite(f.uv_ref).all(-1))
    feat = f._replace(valid=f.valid & ffin,
                      mu=jnp.where(ffin, f.mu, 0.5),
                      var=jnp.where(ffin, f.var, 0.25))
    zfin = jnp.isfinite(state.vtx_z)
    vtx_z = jnp.where(zfin, state.vtx_z, 0.5)
    vfin = jnp.isfinite(state.vtx_x)
    kffin = (jnp.isfinite(state.kf_q).all(-1)
             & jnp.isfinite(state.kf_t).all(-1))
    ident_q = jnp.array([1.0, 0.0, 0.0, 0.0], jnp.float32)
    return state._replace(
        feat=feat,
        vtx_x=jnp.where(vfin, state.vtx_x, vtx_z),
        vtx_z=vtx_z,
        vtx_w=jnp.where(jnp.isfinite(state.vtx_w), state.vtx_w, 0.0),
        edge_q=jnp.where(jnp.isfinite(state.edge_q), state.edge_q, 0.0),
        vtx_in_graph=state.vtx_in_graph & vfin & zfin & ffin,
        vtx_uv=jnp.where(jnp.isfinite(state.vtx_uv), state.vtx_uv, 0.0),
        kf_valid=state.kf_valid & kffin,
        kf_q=jnp.where(kffin[:, None], state.kf_q, ident_q),
        kf_t=jnp.where(kffin[:, None], state.kf_t, 0.0),
        prev_q=jnp.where(jnp.isfinite(state.prev_q).all(), state.prev_q,
                         ident_q),
        prev_t=jnp.where(jnp.isfinite(state.prev_t).all(), state.prev_t,
                         0.0),
        cell_err=jnp.nan_to_num(state.cell_err),
    )


def _frame_input_ok(pose: SE3, gray: np.ndarray) -> bool:
    """Host-side input gate (cheap: 7 floats + one vectorized isfinite):
    garbage poses/images are rejected before they ever ship to the device
    (reference: tf lookup failures and bad frames drop the frame,
    tracked_image_stream.cc:182-185).

    Callers must pass HOST poses: a pose held as a device array makes
    the np.asarray here a D2H pull — one full link RTT per frame on a
    tunneled backend (measured ~400 ms per 6-frame window; the round-2
    e2e-throughput mystery). Live streams produce host poses naturally;
    benches must convert up front."""
    q = np.asarray(pose.q, np.float64)
    t = np.asarray(pose.t, np.float64)
    if not (np.all(np.isfinite(q)) and np.all(np.isfinite(t))):
        return False
    if abs(float(q @ q) - 1.0) > 0.1:
        return False
    g = np.asarray(gray)
    if g.dtype.kind == "f" and not np.all(np.isfinite(g)):
        return False
    return True


@partial(jax.jit, static_argnames=("T", "E", "N", "D"))
def _unpack_topology(buf, *, T: int, E: int, N: int, D: int):
    """Split one packed int32 topology upload into its arrays on device
    (one H2D instead of six — link latency dominates per-transfer cost on
    tunneled backends). The trailing element is the frame-id watermark of
    the vertex state the triangulation was built from."""
    o = 0
    tris = buf[o:o + 3 * T].reshape(T, 3)
    o += 3 * T
    tv = buf[o:o + T] > 0
    o += T
    edges = buf[o:o + 2 * E].reshape(E, 2)
    o += 2 * E
    ev = buf[o:o + E] > 0
    o += E
    inc_e = buf[o:o + N * D].reshape(N, D)
    o += N * D
    inc_s = buf[o:o + N * D].reshape(N, D).astype(jnp.float32)
    o += N * D
    watermark = buf[o]
    return tris, tv, edges, ev, inc_e, inc_s, watermark


class Flame:
    """Host orchestrator mirroring the reference flame::Flame surface."""

    def __init__(self, width: int, height: int, K=None, Kinv=None,
                 params: Optional[FlameParams] = None,
                 cam: Optional[Pinhole] = None,
                 deferred_triangulation: bool = False,
                 tri_backpressure: str = "drop",
                 topo_upload: str = "merged"):
        if cam is None:
            if K is None:
                raise ValueError("provide K or cam")
            cam = Pinhole.from_K(np.asarray(K), width, height)
        self.cam = cam
        # Resolve auto knobs (e.g. Pallas raster on TPU) against the
        # backend this engine will actually dispatch to.
        self.params = (params or FlameParams()).resolved(
            jax.default_backend())
        self.state = init_state(self.params, cam)
        self.stats_ = StatsTracker()
        self._num_poseframes = 0
        self._frame_count = 0
        self._kf_slot = 0
        # Max frame id dispatched so far — the watermark recorded with
        # each triangulation (EngineState.topo_frame_id).
        self._max_frame_id = 0
        # Device handles of the most recent frame's products — pulled to
        # host lazily (D2H over a tunneled link is the bottleneck, not
        # compute; see DEVICE_STATS_KEYS).
        # Deferred mode: the triangulation round-trip overlaps the next
        # windows' compute (topology staleness grows by up to
        # _MAX_TRI_INFLIGHT poseframe periods on a slow link — FLaME
        # already smooths over stale topology between poseframes).
        self.deferred_triangulation = deferred_triangulation
        self.tri_backpressure = tri_backpressure  # "drop" | "block"
        # How a deferred triangulation's packed topology reaches the
        # device: "merged" appends the int32 buffer (as bytes) to the NEXT
        # window's packed H2D — literally one transfer per window even
        # across retriangulations, saving a full link round-trip on
        # latency-dominated links (measured: transfers through the
        # tunneled relay SERIALIZE — concurrent device_puts are ~2.6x
        # slower in aggregate than serial, so fewer transfers is the only
        # lever). "separate" uploads topology on the worker thread as its
        # own transfer (fine on local PCIe).
        self.topo_upload = topo_upload  # "merged" | "separate"
        # Split poseframe windows into [pf] + [rest] dispatches so the
        # deferred triangulation snapshot completes after one frame of
        # compute (see _dispatch_packed). Only meaningful (and only on)
        # when triangulation is deferred.
        self.split_pf_dispatch = deferred_triangulation
        # Deferred-triangulation D2H transport: "worker" (default) pulls
        # the packed (uv, in_graph) snapshot on the tri worker thread —
        # its own link round-trip per poseframe; "probe" hands the
        # snapshot out through completion_probe()/deliver_probe() so a
        # driver that already pulls a per-window completion probe (the
        # sustained streaming loop's bounded-latency gate) makes the
        # snapshot ride THAT pull — zero extra link transfers
        # (VERDICT r3 item 3: tri_d2h_occ was the binding constraint).
        self.tri_d2h = "worker"
        self._pending_probe = None   # (device buf, Future) awaiting pull
        self._topo_installs = 0      # lifetime topology installs (diag)
        self._tri_superseded = 0     # built topologies skipped for newer
        # Host-side watermark of the last installed topology. Installs
        # arrive from two independent paths in the prefetched streaming
        # loop — the async pending-job drain and the pack-time-merged
        # upload (built PREFETCH-DEPTH windows earlier) — so ordering by
        # call sequence alone can go backwards; _install_topology skips
        # any topology older than this watermark.
        self._installed_topo_wm = -1
        self._probe_timeout = 2.0    # worker fallback if never delivered
        self._pending_tri = deque()  # in-flight deferred jobs, oldest first
        self._tri_dropped = 0  # retriangulations skipped under link pressure
        # Occupancy accounting for the sustained-streaming bench: seconds
        # each pipeline resource was busy (host wall-clock inside the
        # respective call).
        self.perf = {"h2d_s": 0.0, "h2d_wait_s": 0.0, "tri_d2h_s": 0.0,
                     "tri_host_s": 0.0, "dispatch_s": 0.0, "n_uploads": 0}
        # Double-buffered H2D: prefetch_window() packs a future window and
        # starts its upload on this single worker thread so link latency
        # overlaps the in-flight window's compute (high-latency links).
        self._h2d_pool = None
        self._tri_pool = None  # deferred triangulation gets its own
        # worker so a slow D2H pull never queues behind a window upload
        self._prefetch_issued = deque()
        self._stale_tri_windows = 0  # telemetry: dispatches on stale topo
        self._dev_status = None
        self._dev_stats = None
        self._dev_stats_window = None
        self._dev_uv_match = None
        self._dev_detections = None
        self._host_status = None
        self._host_idepth = None
        self._host_idepth_frame = -1
        # Failure semantics (reference: update() returns false on real
        # tracking failure). Set when a pulled health word reports
        # divergence; the next update() sanitizes state, fails the frame,
        # and continues.
        self._needs_recovery = False
        self.num_failed_frames = 0
        # Debug-rate stage profiling (reference 13-stage vocabulary).
        self._frames_since_profile = 0

    def shutdown(self):
        """Tear down worker pools and abandon in-flight jobs (reference
        analog: FlameNodelet joins its processing thread on destruction).
        Prefetched windows and pending triangulations are dropped —
        callers that need them must consume/drain first. Safe to call
        twice; the engine remains usable (pools lazily recreate)."""
        self._prefetch_issued.clear()
        self._pending_tri.clear()
        for attr in ("_h2d_pool", "_tri_pool"):
            pool = getattr(self, attr)
            if pool is not None:
                pool.shutdown(wait=False, cancel_futures=True)
                setattr(self, attr, None)

    # -- main entry ------------------------------------------------------
    def update(self, time: float, img_id: int, pose: SE3,
               img_gray: np.ndarray, is_poseframe: bool,
               idepths_truth: Optional[np.ndarray] = None,
               gt_depth: Optional[np.ndarray] = None,
               img_pyr=None) -> bool:
        """Process one posed grayscale frame. Returns False on failure
        (reference semantics: frame skipped, engine continues).

        All device work is dispatched asynchronously; nothing syncs to the
        host here except the poseframe-rate triangulation pull. Telemetry
        is materialized by `flush_stats()`. Passing `gt_depth` folds the
        GT confusion matrix into the device stats vector.

        `img_pyr`: optional device-resident [L>=NUM_LEVELS, H, W] padded
        pyramid of `img_gray` (ops/pyramid layout). When a caller already
        built one — the direct tracker aligns on the same frame's pyramid
        — passing it skips the engine's own H2D + in-dispatch rebuild
        (one pyramid per frame, VERDICT r1 weak #10).
        """
        if self._prefetch_issued:
            raise RuntimeError("outstanding prefetched windows; "
                               "consume them first")
        if self._fail_or_recover(pose, img_gray):
            return False
        s = self.stats_
        s.tick("update")
        s.set_timing("update_locking", 0.0)  # no upload wait here
        book = (self._num_poseframes, self._kf_slot)
        try:
            first = self._num_poseframes == 0
            is_pf = bool(is_poseframe or first)
            use_truth = idepths_truth is not None
            has_gt = gt_depth is not None
            gt = (jnp.asarray(gt_depth, jnp.float32) if has_gt
                  else _ZERO_IMG(self.cam))

            if not use_truth and img_pyr is None:
                # Single-frame window: one packed H2D, one dispatch.
                [(packed, seg_gt, first_is_pf, any_pf, B, mid)] = \
                    self._pack_segments(
                        [(time, img_id, pose, img_gray, is_pf)],
                        gt[None] if has_gt else None)
                packed, topo_len, topo_wm = self._merge_ready_topo(packed)
                self._dispatch_packed(self._timed_put(packed), seg_gt,
                                      first_is_pf, any_pf, B, mid,
                                      topo_len=topo_len, topo_wm=topo_wm)
            else:
                with s.scope("frame_creation"):
                    if img_pyr is not None:
                        img_pyr = img_pyr[:NUM_LEVELS]
                    else:
                        img_pyr = build_pyramid(
                            jnp.asarray(img_gray, jnp.float32).astype(
                                jnp.float32), NUM_LEVELS)
                cur_q = jnp.asarray(pose.q, jnp.float32)
                cur_t = jnp.asarray(pose.t, jnp.float32)
                self._max_frame_id = max(self._max_frame_id, int(img_id))
                truth = (jnp.asarray(idepths_truth, jnp.float32)
                         if use_truth else _ZERO_IMG(self.cam))
                kf_slot = self._kf_slot
                if is_pf:
                    self._num_poseframes += 1
                    self._kf_slot = ((self._kf_slot + 1)
                                     % self.params.engine.max_keyframes)
                with s.scope("update_idepths"):
                    (self.state, status, uv_match, counts_vec,
                     dets) = _track_step(
                        self.state, img_pyr, cur_q, cur_t,
                        jnp.int32(img_id), jnp.int32(kf_slot),
                        jnp.asarray(is_pf), truth,
                        cam=self.cam, params=self.params,
                        use_truth=use_truth)
                    self._dev_detections = dets
                if is_pf:
                    with s.scope("triangulate"):
                        self._retriangulate()
                with s.scope("sync_graph"):
                    self.state, idepth_map, stats_vec = _smooth_step(
                        self.state, img_pyr, cur_q, cur_t, counts_vec, gt,
                        cam=self.cam, params=self.params, has_gt=has_gt)
                self._dev_status = status
                self._dev_uv_match = uv_match
                self._dev_stats = stats_vec
                self._host_status = None
                self._frame_count += 1
            self._maybe_profile_stages(pose, img_gray)
            return True
        except FloatingPointError:
            # Roll back pack-time poseframe bookkeeping so the host
            # counters stay in sync with the device keyframe ring.
            self._num_poseframes, self._kf_slot = book
            return False
        finally:
            s.tock("update")

    def _fail_or_recover(self, pose=None, img_gray=None) -> bool:
        """Failure gate shared by update paths. Returns True if the frame
        must fail: either a previously-pulled health word flagged
        divergence (state is sanitized, engine continues), or the inputs
        are garbage (rejected before upload)."""
        if self._needs_recovery:
            self.state = _sanitize_state(self.state)
            self._needs_recovery = False
            self.num_failed_frames += 1
            return True
        if pose is not None and not _frame_input_ok(pose, img_gray):
            self.num_failed_frames += 1
            return True
        return False

    def _check_health(self, rec: dict) -> None:
        if rec.get("health", 1.0) < 0.5:
            self._needs_recovery = True

    def _maybe_profile_stages(self, pose, img_gray, n_frames: int = 1):
        """Debug-rate stage profiling (debug.profile_stages): re-measure
        the reference's 13-stage timing vocabulary against the current
        state every `profile_stages_every` frames. Costs host syncs —
        never on the product path unless explicitly enabled."""
        dbg = self.params.debug
        if not dbg.profile_stages:
            return
        self._frames_since_profile += n_frames
        if self._frames_since_profile < dbg.profile_stages_every:
            return
        self._frames_since_profile = 0
        from flame_ros_tpu.utils.stage_profiler import profile_stages
        profile_stages(self, img_gray, pose)

    def update_window(self, frames=None, gt_depths=None,
                      prefetched=None) -> bool:
        """Process several frames in ONE device dispatch (one packed H2D).

        frames: list of (time, img_id, pose: SE3, gray uint8/float,
        is_poseframe) tuples. At most the topology staleness grows by the
        window length (FLaME already smooths with stale topology between
        retriangulations). gt_depths: optional [B, H, W] GT depth for
        device-side evaluation.

        prefetched: a handle from `prefetch_window` — the window's packed
        buffer is already uploading on a background thread; this call only
        waits for the transfer and dispatches compute. Handles must be
        consumed in issue order.
        """
        if prefetched is None and not frames:
            return True
        if self._fail_or_recover():
            return False
        if frames is not None:
            ok = [f for f in frames if _frame_input_ok(f[2], f[3])]
            self.num_failed_frames += len(frames) - len(ok)
            if not ok and prefetched is None:
                return False
            frames = ok
        s = self.stats_
        s.tick("update")
        # No upload wait on the non-prefetched paths (see the prefetched
        # branch); reset so the last prefetched window's wait doesn't
        # leak into later frames' records.
        s.set_timing("update_locking", 0.0)
        book = (self._num_poseframes, self._kf_slot)
        try:
            if prefetched is not None:
                if (not self._prefetch_issued
                        or self._prefetch_issued[0] is not prefetched):
                    raise RuntimeError(
                        "prefetched windows must be consumed in issue "
                        "order, with no other updates interleaved")
                self._prefetch_issued.popleft()
                # Install any topology that completed since this window
                # was PACKED (prefetch depth windows ago): pack-time
                # merging alone pins topology staleness at the prefetch
                # depth plus the build lag — 3-4 poseframe periods of
                # feature churn whose freshness watermark masked most
                # triangles (round-5 streaming-accuracy runner: dense
                # coverage oscillated 0.85 -> 0.3 at depth 2). The
                # install is one extra ASYNC upload riding alongside
                # compute, not a new sync point. (Stale telemetry is
                # counted once per window, in _dispatch_packed.)
                self._apply_pending_triangulation(block=False,
                                                  count_stale=False)
                for (fut, gfut, first_is_pf, any_pf, B, mid,
                     topo_len, topo_wm) in prefetched:
                    tw = time_mod.perf_counter()
                    dev = fut.result()
                    gdev = gfut.result() if gfut else None
                    waited = time_mod.perf_counter() - tw
                    self.perf["h2d_wait_s"] += waited
                    # Reference update_locking (the wait before the
                    # engine may mutate state, msg/FlameStats.msg:32):
                    # here that is the wait for the window's upload.
                    self.stats_.set_timing("update_locking",
                                           waited * 1e3 / max(B, 1))
                    self._dispatch_packed(dev, gdev, first_is_pf, any_pf,
                                          B, mid, topo_len=topo_len,
                                          topo_wm=topo_wm)
                return True
            if self._prefetch_issued:
                raise RuntimeError(
                    "outstanding prefetched windows; consume them first")
            frames = self._force_first_poseframe(list(frames))
            gt_np = (np.asarray(gt_depths, np.float32)
                     if gt_depths is not None else None)
            for packed, seg_gt, first_is_pf, any_pf, B, mid in \
                    self._pack_segments(frames, gt_np):
                packed, topo_len, topo_wm = self._merge_ready_topo(packed)
                self._dispatch_packed(
                    self._timed_put(packed),
                    jax.device_put(seg_gt) if seg_gt is not None else None,
                    first_is_pf, any_pf, B, mid, topo_len=topo_len,
                    topo_wm=topo_wm)
            self._maybe_profile_stages(frames[-1][2], frames[-1][3],
                                       n_frames=len(frames))
            return True
        except FloatingPointError:
            self._num_poseframes, self._kf_slot = book
            return False
        finally:
            s.tock("update")

    def prefetch_window(self, frames, gt_depths=None):
        """Pack a FUTURE window and start its H2D upload on a background
        thread, overlapping link latency with the in-flight window's
        compute (double-buffered upload for high-latency links).

        Returns a handle for `update_window(prefetched=...)`. Poseframe
        bookkeeping commits at pack time, so prefetched windows MUST be
        consumed in issue order with no other update()/update_window()
        calls interleaved.
        """
        if not frames:
            return None
        ok = [f for f in frames if _frame_input_ok(f[2], f[3])]
        self.num_failed_frames += len(frames) - len(ok)
        frames = ok
        if not frames:
            return None
        if self._h2d_pool is None:
            from concurrent.futures import ThreadPoolExecutor
            self._h2d_pool = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="flame-h2d")
        frames = self._force_first_poseframe(list(frames))
        # GT may arrive PRESTAGED as a device array (evaluation harness
        # over a slow link: the GT payload is 4x the product payload and
        # is not part of the product path — scripts/chip_acc_streaming
        # uploads it once before the timed loop). Device arrays slice
        # lazily per segment; the gfut device_put below is then a no-op.
        if gt_depths is not None and isinstance(gt_depths, jax.Array):
            gt_np = gt_depths
        else:
            gt_np = (np.asarray(gt_depths, np.float32)
                     if gt_depths is not None else None)
        tp = time_mod.perf_counter()
        handle = []
        for packed, seg_gt, first_is_pf, any_pf, B, mid in \
                self._pack_segments(frames, gt_np):
            packed, topo_len, topo_wm = self._merge_ready_topo(packed)
            fut = self._h2d_pool.submit(self._timed_put, packed)
            gfut = (self._h2d_pool.submit(jax.device_put, seg_gt)
                    if seg_gt is not None else None)
            handle.append((fut, gfut, first_is_pf, any_pf, B, mid,
                           topo_len, topo_wm))
        self._prefetch_issued.append(handle)
        self.perf["pack_s"] = (self.perf.get("pack_s", 0.0)
                               + time_mod.perf_counter() - tp)
        return handle

    def _timed_put(self, buf):
        """device_put with upload-occupancy accounting (the put blocks
        for most of the transfer on the tunneled relay)."""
        t0 = time_mod.perf_counter()
        out = jax.device_put(buf)
        self.perf["h2d_s"] += time_mod.perf_counter() - t0
        self.perf["n_uploads"] += 1
        return out

    def _merge_ready_topo(self, packed: np.ndarray):
        """If a deferred triangulation finished, append its packed int32
        topology (as bytes) to this window's upload. Returns
        (buffer, topo_len): topo_len == 0 means a plain [B, F] window;
        otherwise the buffer is flat uint8 [B*F + 4*topo_len] and the
        dispatch installs the carried topology before the window step."""
        if (self.topo_upload != "merged" or not self._pending_tri
                or not self._pending_tri[0].done()):
            return packed, 0, -1
        # Collapse the done prefix and carry only the NEWEST completed
        # topology: topology is snapshot state — installing an older one
        # when a newer has already been built just re-rasters through a
        # staler freshness watermark. Without this, a transient stall
        # (first-compile, link hiccup) backs the job queue up to 4-6
        # deep and the one-per-pack drain then installs 4-6-poseframe-
        # old topologies FOREVER: measured (round 5, probe transport,
        # both backends) the watermark masked almost every triangle and
        # dense coverage decayed 0.70 -> ~0.00 over ~5 windows while
        # "installs" kept counting. The jobs run on a single FIFO
        # worker, so the done prefix is contiguous.
        topo = None
        topo_wm = -1
        while self._pending_tri and self._pending_tri[0].done():
            if topo is not None:
                self._tri_superseded += 1
            fut = self._pending_tri.popleft()
            topo = fut.result()
            topo_wm = getattr(fut, "wm", -1)
        flat = np.concatenate([packed.reshape(-1),
                               topo.view(np.uint8)])
        return flat, int(topo.shape[0]), topo_wm

    def _force_first_poseframe(self, frames):
        if self._num_poseframes == 0 and frames:
            t0, i0, p0, g0, _ = frames[0]
            frames = [(t0, i0, p0, g0, True)] + frames[1:]
        return frames

    def _apply_pending_triangulation(self, block: bool = True,
                                     count_stale: bool = True):
        """Install topology built by earlier windows' deferred
        triangulation jobs (D2H pull + host Delaunay + packed upload, all
        of which ran on the worker thread behind this window's compute).
        Completed jobs install in issue order.

        With block=False unfinished jobs are left pending (the dispatch
        proceeds on stale topology — FLaME smooths over stale topology by
        design) so the round-trip never sits on the dispatch critical
        path. With block=True every pending job drains.

        count_stale=False suppresses the stale-window telemetry tick:
        the prefetched path polls here at dispatch time AND checks again
        inside _dispatch_packed — counting both would double every
        stale window in `_stale_tri_windows`."""
        applied = False
        buf = None
        buf_wm = None
        while self._pending_tri:
            fut = self._pending_tri[0]
            if not block and not fut.done():
                break
            self._pending_tri.popleft()
            if buf is not None:
                # Snapshot semantics: only the newest completed topology
                # is worth installing (see _merge_ready_topo).
                self._tri_superseded += 1
            buf = fut.result()
            buf_wm = getattr(fut, "wm", None)
        if buf is not None:
            if isinstance(buf, np.ndarray):  # merged mode holds host bufs
                buf = jax.device_put(buf)
            self._install_topology(buf, wm=buf_wm)
            applied = True
        if not applied and self._pending_tri and count_stale:
            self._stale_tri_windows += 1

    def _pack_segments(self, frames, gt_batch):
        """Pack frames into poseframe-aligned uint8 segments (pf only at
        index 0 — the compiled graph needs no branches), committing the
        poseframe/keyframe-slot bookkeeping. Host-only; no device calls.

        Returns [(packed [B, H*W+meta] u8, gt [B,H,W] f32 | None,
                  first_is_pf, any_pf, B, seg_max_id)].
        """
        H, W = self.cam.height, self.cam.width
        cuts = ([0] + [b for b in range(1, len(frames)) if frames[b][4]]
                + [len(frames)])
        segs = []
        for s0, s1 in zip(cuts[:-1], cuts[1:]):
            seg = frames[s0:s1]
            B = len(seg)
            packed = np.empty((B, H * W + META_LEN * 4), np.uint8)
            any_pf = False
            seg_max_id = 0
            for b, (time, img_id, pose, gray, is_pf) in enumerate(seg):
                seg_max_id = max(seg_max_id, int(img_id))
                if is_pf:
                    any_pf = True
                    kf_slot = self._kf_slot
                    self._num_poseframes += 1
                    self._kf_slot = ((self._kf_slot + 1)
                                     % self.params.engine.max_keyframes)
                else:
                    kf_slot = 0
                g = np.asarray(gray)
                packed[b, :H * W] = (
                    g.ravel() if g.dtype == np.uint8
                    else np.clip(g, 0, 255).astype(np.uint8).ravel())
                packed[b, H * W:] = pack_frame_meta(
                    np.asarray(pose.q), np.asarray(pose.t), img_id, is_pf,
                    kf_slot)
            seg_gt = gt_batch[s0:s1] if gt_batch is not None else None
            segs.append((packed, seg_gt, bool(seg[0][4]), any_pf, B,
                         seg_max_id))
        return segs

    def _dispatch_packed(self, packed_dev, gt_dev, first_is_pf, any_pf, B,
                         seg_max_id: int = 0, topo_len: int = 0,
                         topo_wm: int = -1):
        """Dispatch one packed (already on-device) segment, then
        retriangulate if it contained a poseframe."""
        # Watermark advances at DISPATCH time (prefetched windows pack
        # early; the triangulation watermark must reflect what actually
        # ran).
        self._max_frame_id = max(self._max_frame_id, seg_max_id)
        if topo_len:
            # The window upload carried a finished triangulation: split
            # it off on device (bytes -> int32 bitcast, little-endian on
            # both sides) and install before this window's step.
            H, W = self.cam.height, self.cam.width
            F = H * W + META_LEN * 4
            win = packed_dev[:B * F].reshape(B, F)
            topo_u8 = packed_dev[B * F:].reshape(topo_len, 4)
            topo_i32 = jax.lax.bitcast_convert_type(topo_u8, jnp.int32)
            # topo_wm: the merge happened up to PREFETCH-DEPTH windows
            # ago; the monotonic guard skips this install if the async
            # drain already put a newer build in place.
            self._install_topology(topo_i32,
                                   wm=topo_wm if topo_wm >= 0 else None)
            packed_dev = win
        if self.topo_upload == "merged":
            if self._pending_tri and not topo_len:
                self._stale_tri_windows += 1
        else:
            self._apply_pending_triangulation(block=False)
        has_gt = gt_dev is not None
        if gt_dev is None:
            gt_dev = jnp.zeros((B, self.cam.height, self.cam.width),
                               jnp.float32)
        # Per-frame coarse stage record (VERDICT r2 item 9): the fused
        # window step has exactly one observable host boundary, timed
        # here and amortized per frame. Under async dispatch this is
        # host-side enqueue cost; on sync backends it includes compute.
        # The full 13-key device breakdown remains the sampled stage
        # profiler's job (utils/stage_profiler.py).
        # Last-value keys reset per dispatch so paths that don't set
        # them never re-emit a stale value in later frames' records.
        self.stats_.set_timing("dispatch_pf", 0.0)
        t0 = time_mod.perf_counter()
        split = (any_pf and first_is_pf and B > 1
                 and self.split_pf_dispatch)
        if split:
            # Split poseframe windows into [pf frame] + [rest]: the
            # deferred triangulation's D2H snapshot then only waits for
            # ONE frame of compute instead of the whole window — on a
            # high-latency link the tri round-trip is the sustained-
            # streaming binding constraint (occupancy 0.41-0.46,
            # BENCH_NOTES round 3). Also a semantic improvement: the
            # snapshot captures vertex positions AT the poseframe (the
            # frame the graph belongs to, reference poseframe semantics
            # src/flame_nodelet.cc:632-633) instead of wherever they
            # projected to by window end.
            (self.state, st1, uv1, stats1, dets1) = _window_step(
                self.state, packed_dev[:1], gt_dev[:1],
                cam=self.cam, params=self.params, has_gt=has_gt,
                first_is_pf=True)
            ts = time_mod.perf_counter()
            self.stats_.set_timing("dispatch_pf", (ts - t0) * 1e3)
            with self.stats_.scope("triangulate"):
                self._schedule_triangulation()
            self.perf["tri_sched_s"] = (self.perf.get("tri_sched_s", 0.0)
                                        + time_mod.perf_counter() - ts)
            (self.state, statuses, uv_matches, stats2, dets) = \
                _window_step(
                    self.state, packed_dev[1:], gt_dev[1:],
                    cam=self.cam, params=self.params, has_gt=has_gt,
                    first_is_pf=False)
            stats = jnp.concatenate([stats1, stats2], axis=0)
        else:
            (self.state, statuses, uv_matches, stats, dets) = \
                _window_step(
                    self.state, packed_dev, gt_dev,
                    cam=self.cam, params=self.params, has_gt=has_gt,
                    first_is_pf=first_is_pf)
        dt = time_mod.perf_counter() - t0
        self.perf["dispatch_s"] += dt
        self.stats_.set_timing("dispatch", dt * 1e3 / max(B, 1))
        self._dev_status = statuses[-1]
        self._dev_uv_match = uv_matches[-1]
        self._dev_stats = stats[-1]
        self._dev_stats_window = stats
        self._dev_detections = (dets[0][-1], dets[1][-1])
        self._host_status = None
        self._frame_count += B
        if any_pf and not split:
            t1 = time_mod.perf_counter()
            with self.stats_.scope("triangulate"):
                if self.deferred_triangulation:
                    self._schedule_triangulation()
                else:
                    self._retriangulate()
            self.perf["tri_sched_s"] = (self.perf.get("tri_sched_s", 0.0)
                                        + time_mod.perf_counter() - t1)

    def flush_window_stats(self) -> list:
        """Pull per-frame stats for the whole last window in ONE D2H."""
        if self._dev_stats_window is None:
            return [self.flush_stats()] if self._dev_stats is not None \
                else []
        arr = np.asarray(self._dev_stats_window)
        recs = [dict(zip(DEVICE_STATS_KEYS, (float(v) for v in row)))
                for row in arr]
        if recs:
            for k, v in recs[-1].items():
                self.stats_.set(k, v)
            self._check_health(recs[-1])
        return recs

    def flush_stats(self) -> dict:
        """Pull the packed per-frame stats vector (ONE small transfer) and
        fill the StatsTracker. Returns {key: value}."""
        s = self.stats_
        if self._dev_stats is None:
            return {}
        vals = np.asarray(self._dev_stats)
        rec = dict(zip(DEVICE_STATS_KEYS, (float(v) for v in vals)))
        for k, v in rec.items():
            s.set(k, v)
        self._check_health(rec)
        return rec

    # -- host triangulation (poseframe rate) -----------------------------
    def _retriangulate(self):
        # Single packed D2H (uv + eligibility) — transfer latency over a
        # tunneled link dominates, so one pull beats two.
        N = self.params.engine.max_features
        buf = np.asarray(jnp.concatenate(
            [self.state.vtx_uv.reshape(-1),
             self.state.vtx_in_graph.astype(jnp.float32)]))
        uv = buf[:2 * N].reshape(N, 2)
        self._apply_topology(uv, buf[2 * N:] > 0.5, self._max_frame_id)

    def _schedule_triangulation(self):
        """Deferred mode: run the WHOLE triangulation round-trip — async
        D2H pull of vertex positions, host Delaunay + incidence build, and
        the packed topology upload — on the worker thread, hiding it
        behind the next window's compute. The result installs at the next
        window boundary (topology staleness grows by one window; FLaME
        already smooths over stale topology between poseframes)."""
        # Bounded in-flight pipeline: completed jobs install at every
        # window boundary (_dispatch_packed). When the link is slower
        # than _MAX_TRI_INFLIGHT poseframe periods of compute, the
        # backpressure policy decides: "drop" (default) skips THIS
        # retriangulation — topology staleness grows one pf period; the
        # mesh keeps smoothing and the next poseframe tries again — the
        # same graceful-degradation stance as the reference's drop-on-
        # full frame queue (thread_safe_queue.h:70-83). "block" waits
        # and guarantees every poseframe's topology installs, in order.
        # Probe transport: a scheduled job spends its first few windows
        # parked on the probe Future, consuming NO link bandwidth — the
        # backpressure bound must cover the driver's probe-delivery
        # distance (typically 4 windows) plus the build, or every
        # poseframe inside that pipeline drops (measured: 98/148 drops
        # with the worker-mode bound of 2).
        limit = (_MAX_TRI_INFLIGHT if self.tri_d2h != "probe"
                 else _MAX_TRI_INFLIGHT + 6)
        if len(self._pending_tri) >= limit:
            if self.tri_backpressure == "drop":
                self._tri_dropped += 1
                return
            while len(self._pending_tri) >= limit:
                fut = self._pending_tri.popleft()
                buf = fut.result()
                if isinstance(buf, np.ndarray):
                    buf = jax.device_put(buf)
                self._install_topology(buf, wm=getattr(fut, "wm", None))
        # ONE packed device buffer -> one D2H round-trip on the worker
        # (two separate pulls cost two link RTTs on tunneled backends).
        N = self.params.engine.max_features
        buf_h = jnp.concatenate(
            [self.state.vtx_uv.reshape(-1),
             self.state.vtx_in_graph.astype(jnp.float32)])
        try:
            buf_h.copy_to_host_async()
        except Exception:
            pass  # backend may not support async copies; pull later
        if self._tri_pool is None:
            from concurrent.futures import ThreadPoolExecutor
            self._tri_pool = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="flame-tri")

        wm = self._max_frame_id

        snap_fut = None
        if self.tri_d2h == "probe":
            # The snapshot rides the driver's next completion-probe pull
            # instead of its own D2H. If a newer poseframe overwrites an
            # undelivered probe, the old job falls back to its own pull
            # after _probe_timeout (the data is still on device).
            from concurrent.futures import Future
            snap_fut = Future()
            self._pending_probe = (buf_h, snap_fut)

        def job():
            t0 = time_mod.perf_counter()
            buf = None
            if snap_fut is not None:
                try:
                    buf = snap_fut.result(timeout=self._probe_timeout)
                    self.perf["tri_wait_s"] = (
                        self.perf.get("tri_wait_s", 0.0)
                        + time_mod.perf_counter() - t0)
                except Exception:
                    buf = None  # undelivered probe -> own pull below
                t0 = time_mod.perf_counter()
            if buf is None:
                buf = np.asarray(buf_h)
                self.perf["tri_d2h_s"] += time_mod.perf_counter() - t0
            t1 = time_mod.perf_counter()
            topo = self._build_topology_host(
                buf[:2 * N].reshape(N, 2), buf[2 * N:] > 0.5, wm)
            self.perf["tri_host_s"] += time_mod.perf_counter() - t1
            if self.topo_upload == "merged":
                # Host buffer: rides the next window's packed H2D
                # (_merge_ready_topo) — no separate transfer.
                return topo
            return jax.device_put(topo)

        fut = self._tri_pool.submit(job)
        # Tag the job with its build watermark so install sites can
        # enforce monotonicity host-side (see _install_topology).
        fut.wm = wm
        self._pending_tri.append(fut)

    # -- completion-probe transport (tri_d2h == "probe") -----------------
    def completion_probe(self):
        """(device_array, token) whose pull forces the last dispatched
        work to complete — the bounded-latency gate a streaming driver
        already pays one link RTT for per window. On poseframe windows
        in tri_d2h="probe" mode the array IS the packed triangulation
        snapshot, so the same pull feeds the deferred Delaunay; pass
        the pulled host array back via deliver_probe(token, host_buf).
        NOTE: the snapshot depends only on the poseframe frame's
        compute, so the completion bound gains up to one window of
        slack (the NEXT window's probe transitively forces the rest)."""
        if self._pending_probe is not None:
            dev, fut = self._pending_probe
            self._pending_probe = None
            return dev, fut
        return self.state.vtx_x[:1], None

    def deliver_probe(self, token, host_buf) -> None:
        if token is not None and not token.done():
            token.set_result(np.asarray(host_buf))

    def _build_topology_host(self, uv: np.ndarray, eligible: np.ndarray,
                             watermark: int = 2 ** 30):
        """Delaunay + incidence lists on host, packed into ONE int32
        buffer for a single H2D (six separate uploads cost six link
        round-trips on a tunneled backend). Pure host function — safe on
        the worker thread. `watermark`: max frame id of the vertex state
        this triangulation was built from (EngineState.topo_frame_id)."""
        idx = np.flatnonzero(eligible)
        N = self.params.engine.max_features
        E = self.params.engine.max_edges
        T = self.params.engine.max_triangles
        tris_pad = np.zeros((T, 3), np.int32)
        tv = np.zeros(T, bool)
        edges_pad = np.zeros((E, 2), np.int32)
        ev = np.zeros(E, bool)
        if len(idx) >= 3:
            tris_local = triangulate(uv[idx])
            edges_local = edges_from_triangles(tris_local)
            tris_g = idx[tris_local][:T]
            edges_g = idx[edges_local][:E]
            # Sort triangles by y-extent so the rasterizer's per-block
            # y-interval culling is effective (blocks become y-coherent).
            if len(tris_g):
                ymin = uv[tris_g, 1].min(axis=1)
                tris_g = tris_g[np.argsort(ymin, kind="stable")]
            tris_pad[:len(tris_g)] = tris_g
            tv[:len(tris_g)] = True
            edges_pad[:len(edges_g)] = edges_g
            ev[:len(edges_g)] = True
        # Vertex->edge incidence lists: K^T becomes pure gathers on device
        # (reg_ops.build_incidence drops over-degree edges so K and K^T
        # stay adjoint-consistent).
        inc_e, inc_s, keep = reg_ops.build_incidence(
            edges_pad, ev, N, self.params.engine.max_vertex_degree)
        ev &= keep
        return np.concatenate([
            tris_pad.ravel(), tv.astype(np.int32),
            edges_pad.ravel(), ev.astype(np.int32),
            inc_e.ravel(), inc_s.astype(np.int32).ravel(),
            np.asarray([watermark], np.int32)])

    def _install_topology(self, buf_dev, *, wm=None):
        """Unpack a packed topology upload on device and swap it into the
        engine state (duals reset: the dual space changes with the edge
        set).

        wm: host-side frame-id watermark of the topology, when the caller
        knows it. Installs are monotonic in wm: a topology older than the
        installed one is skipped (counted in _tri_superseded) — in the
        prefetched streaming loop a pack-time-merged topology arrives
        PREFETCH-DEPTH windows after it was merged, by which time the
        async drain may have installed a newer build; installing the
        older one would roll topo_frame_id backwards and re-mask fresh
        triangles. wm=None (unknown/forced) installs unconditionally and
        leaves the guard untouched."""
        if wm is not None:
            if wm < self._installed_topo_wm:
                self._tri_superseded += 1
                return
            self._installed_topo_wm = wm
        e = self.params.engine
        tris, tv, edges, ev, inc_e, inc_s, dwm = _unpack_topology(
            buf_dev, T=e.max_triangles, E=e.max_edges,
            N=e.max_features, D=e.max_vertex_degree)
        self.state = self.state._replace(
            tris=tris, tri_valid=tv, edges=edges, edge_valid=ev,
            inc_edges=inc_e, inc_sign=inc_s, topo_frame_id=dwm,
            edge_q=jnp.zeros_like(self.state.edge_q))
        self._topo_installs += 1

    def _apply_topology(self, uv: np.ndarray, eligible: np.ndarray,
                        watermark: int = 2 ** 30):
        # The 2**30 sentinel means "no freshness gating" (truth-injection
        # style installs) — it must not poison the monotonic guard.
        self._install_topology(
            jax.device_put(self._build_topology_host(uv, eligible,
                                                     watermark)),
            wm=None if watermark >= 2 ** 30 else watermark)

    # -- getters (reference flame::Flame surface) ------------------------
    def _tri_fresh(self):
        """Device-side stale-topology gate for published products (same
        rule as the per-frame raster: mask triangles whose vertex slots
        were re-detected after the installed triangulation)."""
        st = self.state
        v_same = st.feat.frame_id <= st.topo_frame_id
        return st.tri_valid & v_same[st.tris].all(-1)

    def get_inverse_depth_mesh(self):
        """(vertices_px [V,2], idepths [V], normals [V,3], triangles
        [M,3], tri_validity [M], edges [E,2]) — compacted to live
        entries; triangle/edge indices refer to the vertex array rows
        (reference getInverseDepthMesh, backprojection via Kinv happens at
        publish time, utils.cc:184-209)."""
        st = self.state
        vmask = np.asarray(st.vtx_in_graph)
        uv = np.asarray(st.vtx_uv)
        x = np.asarray(st.vtx_x)
        normals = np.asarray(raster_ops.vertex_normals(
            st.vtx_uv, st.vtx_x, st.vtx_w, self.cam))
        tvd = self._tri_fresh()
        tv = np.asarray(tvd)
        tris = np.asarray(st.tris)[tv]
        ev = np.asarray(st.edge_valid)
        edges = np.asarray(st.edges)[ev]
        keep = np.asarray(raster_ops.mesh_display_filters(
            st.vtx_uv, st.vtx_x, st.vtx_w, st.tris, tvd, self.cam,
            filter_oblique=self.params.output.filter_oblique_triangles,
            oblique_normal_thresh=self.params.output.oblique_normal_thresh,
            oblique_idepth_diff_factor=self.params.output.oblique_idepth_diff_factor,
            oblique_idepth_diff_abs=self.params.output.oblique_idepth_diff_abs,
            filter_long_edges=self.params.output.filter_long_edges,
            edge_length_thresh=self.params.output.edge_length_thresh,
            filter_by_idepth=self.params.output.filter_triangles_by_idepth,
            min_triangle_idepth=self.params.output.min_triangle_idepth,
        ))[tv]
        return uv, x, normals, tris, keep, edges

    def get_inverse_depth_map(self) -> np.ndarray:
        """Raw dense idepth map (NaN where uncovered). Rasterized from the
        CURRENT engine state (same snapshot semantics as the filtered/mesh
        getters — the per-frame in-dispatch raster may predate a topology
        install), pulled on demand and cached per frame."""
        if self._host_idepth_frame != self._frame_count:
            st = self.state
            m, _ = raster_ops.rasterize_idepth(
                st.vtx_uv, st.vtx_x, st.tris, self._tri_fresh(),
                height=self.cam.height, width=self.cam.width,
                use_pallas=self.params.engine.use_pallas_raster,
                pallas_kernel=self.params.engine.pallas_raster_kernel)
            self._host_idepth = np.asarray(m)
            self._host_idepth_frame = self._frame_count
        return self._host_idepth

    @property
    def last_status(self) -> Optional[np.ndarray]:
        """Per-feature epipolar status codes of the last frame (pulled on
        demand)."""
        if self._host_status is None and self._dev_status is not None:
            self._host_status = np.asarray(self._dev_status)
        return self._host_status

    def get_filtered_inverse_depth_map(self) -> np.ndarray:
        """Dense idepth map with display filters applied to triangles."""
        st = self.state
        tv = self._tri_fresh()
        keep = raster_ops.mesh_display_filters(
            st.vtx_uv, st.vtx_x, st.vtx_w, st.tris, tv, self.cam,
            filter_oblique=self.params.output.filter_oblique_triangles,
            filter_long_edges=self.params.output.filter_long_edges,
            filter_by_idepth=self.params.output.filter_triangles_by_idepth,
            edge_length_thresh=self.params.output.edge_length_thresh,
            min_triangle_idepth=self.params.output.min_triangle_idepth,
        )
        m, _ = raster_ops.rasterize_idepth(
            st.vtx_uv, st.vtx_x, st.tris, tv & keep,
            height=self.cam.height, width=self.cam.width,
            use_pallas=self.params.engine.use_pallas_raster,
            pallas_kernel=self.params.engine.pallas_raster_kernel)
        return np.asarray(m)

    def get_normal_map(self) -> np.ndarray:
        """Dense per-pixel surface normals (NaN outside; debug/normals)."""
        st = self.state
        return np.asarray(raster_ops.rasterize_normal_map(
            st.vtx_uv, st.vtx_x, st.tris, self._tri_fresh(), self.cam))

    def get_detections(self):
        """Last poseframe's detections: (uv [C,2], taken [C]) or None."""
        if self._dev_detections is None:
            return None
        duv, take = self._dev_detections
        return np.asarray(duv), np.asarray(take)

    def get_raw_idepths(self):
        """(vertices [N,2] current-frame px, mu [N], var [N]) for live
        feature slots (reference getRawIDepths)."""
        v = np.asarray(self.state.feat.valid)
        return (np.asarray(self.state.vtx_uv)[v],
                np.asarray(self.state.feat.mu)[v],
                np.asarray(self.state.feat.var)[v])

    # -- poseframe pose-graph updates (reference §3.4) -------------------
    def update_poseframe_poses(self, pf_ids, pf_poses: SE3):
        """Retro-correct keyframe poses after a pose-graph update
        (reference updatePoseFramePoses, src/flame_nodelet.cc:473-476)."""
        kf_ids = np.asarray(self.state.kf_ids)
        kf_q = np.asarray(self.state.kf_q).copy()
        kf_t = np.asarray(self.state.kf_t).copy()
        qs = np.asarray(pf_poses.q)
        ts = np.asarray(pf_poses.t)
        for i, pid in enumerate(np.asarray(pf_ids)):
            hit = np.flatnonzero(kf_ids == pid)
            if len(hit):
                kf_q[hit[0]] = qs[i]
                kf_t[hit[0]] = ts[i]
        self.state = self.state._replace(kf_q=jnp.asarray(kf_q),
                                         kf_t=jnp.asarray(kf_t))

    def prune_poseframes(self, keep_ids):
        """Drop keyframes absent from keep_ids; their features die
        (reference prunePoseFrames)."""
        kf_ids = np.asarray(self.state.kf_ids)
        keep = np.isin(kf_ids, np.asarray(keep_ids))
        kf_valid = np.asarray(self.state.kf_valid) & keep
        dead_slots = np.flatnonzero(~keep)
        feat_kf = np.asarray(self.state.feat.kf_idx)
        fvalid = np.asarray(self.state.feat.valid).copy()
        fvalid &= ~np.isin(feat_kf, dead_slots)
        self.state = self.state._replace(
            kf_valid=jnp.asarray(kf_valid),
            feat=self.state.feat._replace(valid=jnp.asarray(fvalid)))

    # -- checkpoint / resume (absent in the reference, SURVEY §5.4) ------
    def save_checkpoint(self, path: str):
        """Serialize the full engine state (keyframe tensors, graph state,
        filter posteriors) + host counters. EngineState is a flat pytree of
        arrays, so a single NPZ captures everything."""
        self._apply_pending_triangulation()  # drain deferred topology
        leaves, treedef = jax.tree.flatten(self.state)
        arrays = {}
        bf16 = []
        for i, x in enumerate(leaves):
            a = np.asarray(x)
            if a.dtype == jnp.bfloat16:  # NPZ has no bf16: store bits
                a = a.view(np.uint16)
                bf16.append(i)
            arrays[f"leaf_{i}"] = a
        arrays["__bf16__"] = np.asarray(bf16, np.int32)
        arrays["__host__"] = np.array([
            self._num_poseframes, self._frame_count, self._kf_slot])
        import json
        arrays["__params__"] = np.frombuffer(
            json.dumps(self.params.to_dict()).encode(), dtype=np.uint8)
        np.savez_compressed(path, **arrays)

    def load_checkpoint(self, path: str):
        """Restore engine state saved by save_checkpoint. The engine must
        be constructed with the same capacity params (shape-checked)."""
        data = np.load(path)
        leaves, treedef = jax.tree.flatten(self.state)
        bf16 = set(data["__bf16__"].tolist()) if "__bf16__" in data else set()
        new_leaves = []
        for i, old in enumerate(leaves):
            arr = data[f"leaf_{i}"]
            if i in bf16:
                arr = arr.view(jnp.bfloat16)
            if arr.shape != old.shape:
                raise ValueError(
                    f"checkpoint shape mismatch at leaf {i}: "
                    f"{arr.shape} vs {old.shape} — construct the engine "
                    f"with the same capacity params")
            new_leaves.append(jnp.asarray(arr))
        self.state = jax.tree.unflatten(treedef, new_leaves)
        host = data["__host__"]
        self._num_poseframes = int(host[0])
        self._frame_count = int(host[1])
        self._kf_slot = int(host[2])
        self._host_idepth_frame = -1
        # The restored state's frame ids may be older than anything this
        # engine instance installed; reset the monotonic install guard.
        self._installed_topo_wm = -1

    def stats(self) -> StatsTracker:
        return self.stats_

    @property
    def num_poseframes(self) -> int:
        return self._num_poseframes

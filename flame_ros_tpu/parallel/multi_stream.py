"""Multi-stream / multi-chip execution: batched engine steps over a mesh.

The reference is strictly single-stream single-process (SURVEY §2.10); the
TPU-native scaling story (BASELINE north star) is:

- **dp ("stream" axis)**: many video streams smooth concurrently — the
  engine step is vmapped over a leading stream axis and the batch is
  sharded across devices. No cross-stream communication exists, so this
  axis scales embarrassingly over ICI/DCN.
- **mp ("feat" axis)**: within a stream, the feature/vertex/edge arrays
  shard across devices. The epipolar filter is elementwise over features
  (no communication); the NLTGV2 graph iteration needs neighbor values,
  which XLA turns into all-gathers of the (tiny: 4·N bytes) primal
  vectors over ICI — the graph-domain analog of sequence parallelism with
  halo exchange (SURVEY §5.7).

This module provides the vmapped step and helpers to place a batched
engine state on a `jax.sharding.Mesh` with those axes. Host-side
triangulation stays per-stream on the host at poseframe rate.
"""
from __future__ import annotations

from collections import deque
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flame_ros_tpu.config import FlameParams
from flame_ros_tpu.geometry.camera import Pinhole
from flame_ros_tpu.models import engine as eng_mod
from flame_ros_tpu.models.engine import EngineState, init_state


def make_mesh(devices=None, stream_axis: int | None = None) -> Mesh:
    """Build a ("stream", "feat") mesh over the given devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if stream_axis is None:
        # Default: pure stream-dp. Feature-axis model sharding measured
        # UNPROFITABLE for throughput (bench_scaling feat_axis_speedup =
        # 0.67: 2 streams over 4 devices with feat=2 run slower than over
        # 2 devices with feat=1 — the per-sweep incidence all-gathers
        # serialize against tiny compute). feat>1 remains available via
        # stream_axis for memory-bound configs (e.g. huge feature
        # capacities that do not fit one device's HBM).
        stream_axis = n
    feat_axis = n // stream_axis
    arr = np.asarray(devices).reshape(stream_axis, feat_axis)
    return Mesh(arr, ("stream", "feat"))


def state_shardings(mesh: Mesh) -> EngineState:
    """PartitionSpecs for a stream-batched EngineState: leading axis =
    stream (dp); feature/edge/triangle axes = feat (mp); images/keyframes
    replicated within a stream's device group."""
    s = lambda *axes: NamedSharding(mesh, P(*axes))
    feat_1d = s("stream", "feat")
    feat_2d = s("stream", "feat", None)
    repl = s("stream")
    return EngineState(
        feat=eng_mod.ep_ops.FeatureFilterState(
            uv_ref=feat_2d, kf_idx=feat_1d, mu=feat_1d, var=feat_1d,
            dropouts=feat_1d, valid=feat_1d, frame_id=feat_1d),
        vtx_uv=feat_2d, vtx_x=feat_1d, vtx_w=feat_2d, vtx_z=feat_1d,
        vtx_in_graph=feat_1d,
        edge_q=s("stream", "feat", None),
        edges=s("stream", "feat", None),
        edge_valid=feat_1d,
        inc_edges=s("stream", "feat", None),
        inc_sign=s("stream", "feat", None),
        tris=s("stream", "feat", None),
        tri_valid=feat_1d,
        kf_pyrs=s("stream", None, None, None, None),
        kf_q=s("stream", None, None), kf_t=s("stream", None, None),
        kf_valid=s("stream", None), kf_ids=s("stream", None),
        prev_q=s("stream", None), prev_t=s("stream", None),
        last_idmap=s("stream", None, None),
        last_planes=s("stream", None, None),
        cell_err=s("stream", None, None),
        topo_frame_id=repl,
    )


def init_batched_state(num_streams: int, params: FlameParams,
                       cam: Pinhole) -> EngineState:
    one = init_state(params, cam)
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (num_streams,) + x.shape), one)


@partial(jax.jit, static_argnames=("cam", "params"))
def batched_frame_step(states: EngineState, img_pyrs, qs, ts, frame_ids,
                       *, cam: Pinhole, params: FlameParams):
    """One full (non-poseframe) engine step for a batch of streams:
    epipolar filtering + graph projection + NLTGV2 sweeps + rasterization.
    This is the sustained-throughput inner loop — poseframe handling
    (detection + host triangulation) happens per-stream outside."""
    cov_idx = eng_mod.DEVICE_STATS_KEYS.index("coverage")

    def one(state, img_pyr, q, t, fid):
        zero_img = jnp.zeros((cam.height, cam.width), jnp.float32)
        state, status, uv_match, counts_vec, dets = \
            eng_mod._track_step.__wrapped__(
                state, img_pyr, q, t, fid, jnp.int32(0),
                jnp.asarray(False), zero_img,
                cam=cam, params=params, use_truth=False)
        state, idepth, stats_vec = eng_mod._smooth_step.__wrapped__(
            state, img_pyr, q, t, counts_vec, zero_img,
            cam=cam, params=params, has_gt=False, dense_products=True)
        return state, idepth, stats_vec[cov_idx]

    return jax.vmap(one)(states, img_pyrs, qs, ts, frame_ids)


def place(tree, shardings):
    """device_put a batched state onto the mesh."""
    return jax.tree.map(
        lambda x, sh: jax.device_put(x, sh), tree, shardings,
        is_leaf=lambda x: isinstance(x, (jnp.ndarray, np.ndarray)))


@partial(jax.jit, static_argnames=("cam", "params", "is_pf", "has_gt"))
def batched_full_step(states: EngineState, packed, gt_batch, *,
                      cam: Pinhole, params: FlameParams, is_pf: bool,
                      has_gt: bool):
    """One FULL engine frame (track + smooth, poseframe branch included)
    for a batch of streams, from packed per-stream upload rows
    [S, H*W image bytes | 40 meta bytes]. Poseframes are ALIGNED across
    streams (is_pf is static), so the poseframe branch compiles in
    exactly like the single-stream windowed path — no lax.cond under
    vmap."""
    H, W = cam.height, cam.width

    def one(state, row, gt):
        img = row[:H * W].reshape(H, W).astype(jnp.float32)
        meta = jax.lax.bitcast_convert_type(
            row[H * W:].reshape(eng_mod.META_LEN, 4), jnp.float32)
        cur_q = meta[:4]
        cur_t = meta[4:7]
        frame_id = meta[7].astype(jnp.int32)
        kf_slot = meta[9].astype(jnp.int32)
        from flame_ros_tpu.ops.pyramid import build_pyramid
        img_pyr = build_pyramid(img, eng_mod.NUM_LEVELS)
        state, status, uv_match, counts_vec, dets = \
            eng_mod._track_step.__wrapped__(
                state, img_pyr, cur_q, cur_t, frame_id, kf_slot, is_pf,
                eng_mod._ZERO_IMG(cam), cam=cam, params=params,
                use_truth=False)
        state, idepth, stats_vec = eng_mod._smooth_step.__wrapped__(
            state, img_pyr, cur_q, cur_t, counts_vec, gt,
            cam=cam, params=params, has_gt=has_gt, dense_products=True)
        return state, (idepth, stats_vec)

    return jax.vmap(one)(states, packed, gt_batch)


@partial(jax.jit, static_argnames=("T", "E", "N", "D"))
def _batched_install(states: EngineState, bufs, *, T: int, E: int,
                     N: int, D: int):
    """Install one packed topology upload per stream (vmapped unpack +
    dual reset)."""
    def one(state, buf):
        tris, tv, edges, ev, inc_e, inc_s, wm = \
            eng_mod._unpack_topology.__wrapped__(buf, T=T, E=E, N=N, D=D)
        return state._replace(
            tris=tris, tri_valid=tv, edges=edges, edge_valid=ev,
            inc_edges=inc_e, inc_sign=inc_s, topo_frame_id=wm,
            edge_q=jnp.zeros_like(state.edge_q))

    return jax.vmap(one)(states, bufs)


class MultiStreamRunner:
    """End-to-end N-stream orchestrator: every stream runs the FULL
    algorithm (epipolar filtering, poseframe detection, per-stream host
    Delaunay, NLTGV2 smoothing, rasterization) with stream-dp sharding
    over a device mesh.

    The reference is strictly single-stream (one nodelet per camera,
    SURVEY §2.10); this is the TPU-native scale-out: one engine dispatch
    advances all streams, host triangulation runs per-stream on a worker
    pool between dispatches, and all host<->device traffic is packed —
    ONE [S, ...] image upload per frame, ONE packed D2H + ONE packed
    topology upload per poseframe round.

    Poseframes are aligned across streams (same cadence), which keeps
    the compiled step free of per-stream control flow."""

    def __init__(self, cam: Pinhole, num_streams: int,
                 params: FlameParams | None = None, mesh: Mesh | None = None,
                 deferred_triangulation: bool = False):
        self.cam = cam
        self.S = num_streams
        self.params = (params or FlameParams()).resolved(
            jax.default_backend())
        self.mesh = mesh
        # Multi-controller (jax.distributed) mode: every process runs
        # this same runner with the same global frame schedule; each
        # process touches only its ADDRESSABLE stream shards for host
        # work (D2H, Delaunay, packing) and global arrays assemble via
        # make_array_from_callback — the multi-host TPU flow where each
        # host feeds and triangulates its own streams.
        self.multiprocess = jax.process_count() > 1
        # Deferred mode (mirrors Flame.deferred_triangulation): the
        # poseframe D2H + S Delaunay builds run on the worker pool while
        # the NEXT frames' dispatches proceed; topology installs one
        # frame late (FLaME already smooths over stale topology between
        # poseframes), taking the host work off the critical path.
        self.deferred = deferred_triangulation
        # Install policy for deferred topologies: blocking installs at
        # every update() (REQUIRED in multi-controller mode — done()
        # polling is a per-process host condition gating a collective
        # and would diverge the collective order) vs non-blocking
        # done()-polled installs with drop backpressure (single
        # process). Benches may force blocking in one process for an
        # apples-to-apples policy comparison.
        self.blocking_installs = self.multiprocess
        self._pending_topo = deque()  # in-flight deferred topo jobs
        self.topo_dropped = 0  # retriangulations skipped under pressure
        self.states = init_batched_state(num_streams, self.params, cam)
        if mesh is not None:
            self.states = place(self.states, state_shardings(mesh))
        self._row_sharding = (
            NamedSharding(mesh, P("stream", None)) if mesh is not None
            else None)
        self._num_poseframes = 0
        self._kf_slot = 0
        self._frame_count = 0
        self._max_frame_id = 0  # topology watermark (engine semantics)
        self._tri_pool = None
        self._gt_zero = None     # cached device zeros for no-GT frames
        self.last_stats = None   # [S, len(DEVICE_STATS_KEYS)] device
        self.last_idepth = None  # [S, H, W] device

    def _put_rows(self, arr: np.ndarray, spec=None):
        """Place a host array with leading stream axis onto the mesh.
        In multi-controller mode the array (same on every process, or a
        per-process dict of stream->row) lands via
        make_array_from_callback so each process materializes only its
        addressable shards."""
        if self.mesh is None:
            return jax.device_put(arr)
        spec = spec if spec is not None else P(
            "stream", *([None] * (arr.ndim - 1)))
        sh = NamedSharding(self.mesh, spec)
        if not self.multiprocess:
            return jax.device_put(arr, sh)
        return jax.make_array_from_callback(
            arr.shape, sh, lambda idx: arr[idx])

    def local_streams(self) -> list[int]:
        """Stream indices whose shards this process addresses (all of
        them in single-process mode)."""
        if self.mesh is None or not self.multiprocess:
            return list(range(self.S))
        dv = np.asarray(self.mesh.devices)  # [stream_axis, feat_axis]
        pid = jax.process_index()
        rows = sorted({int(i) for i in range(dv.shape[0])
                       if any(d.process_index == pid for d in dv[i])})
        per = self.S // dv.shape[0]
        out = []
        for r in rows:
            out.extend(range(r * per, (r + 1) * per))
        return out

    def update(self, frames, gt_depths=None) -> bool:
        """Advance every stream by one frame.

        frames: length-S list of (time, img_id, pose: SE3, gray) tuples.
        The poseframe schedule is internal: every
        input.poseframe_subsample_factor-th processed frame is a
        poseframe for ALL streams. In multi-controller mode every
        process passes the same global list (host pack cost is
        duplicated; device bytes move only for addressable shards)."""
        assert len(frames) == self.S
        # Install completed deferred topologies (issue order, never
        # blocking the dispatch path — engine semantics). In
        # multi-controller mode `done()` polling would be a per-process
        # host condition gating a cross-process collective (install is
        # a pjit): processes could diverge on WHEN to install and hang.
        # There, every update() installs whatever is pending, BLOCKING —
        # a deterministic counter-gated point reached identically by all
        # processes; the build still overlaps the poseframe's own
        # dispatch, and topology lands one frame after the poseframe.
        if self.blocking_installs:
            while self._pending_topo:
                self._install_topologies(
                    self._pending_topo.popleft().result())
        else:
            while self._pending_topo and self._pending_topo[0].done():
                self._install_topologies(
                    self._pending_topo.popleft().result())
        pf_every = max(self.params.input.poseframe_subsample_factor, 1)
        is_pf = (self._frame_count % pf_every == 0)
        kf_slot = self._kf_slot
        if is_pf:
            self._num_poseframes += 1
            self._kf_slot = ((self._kf_slot + 1)
                             % self.params.engine.max_keyframes)
        H, W = self.cam.height, self.cam.width
        packed = np.empty((self.S, H * W + eng_mod.META_LEN * 4), np.uint8)
        for s, (time, img_id, pose, gray) in enumerate(frames):
            self._max_frame_id = max(self._max_frame_id, int(img_id))
            g = np.asarray(gray)
            packed[s, :H * W] = (
                g.ravel() if g.dtype == np.uint8
                else np.clip(g, 0, 255).astype(np.uint8).ravel())
            packed[s, H * W:] = eng_mod.pack_frame_meta(
                np.asarray(pose.q), np.asarray(pose.t), img_id, is_pf,
                kf_slot)
        packed_dev = self._put_rows(packed)
        has_gt = gt_depths is not None
        if has_gt:
            gt_dev = self._put_rows(np.asarray(gt_depths, np.float32))
        else:
            # Device-resident zeros, built once: uploading an [S, H, W]
            # host zeros buffer every frame would move ~1.2 MB/stream of
            # constant bytes over the link the runner exists to minimize.
            if self._gt_zero is None:
                self._gt_zero = self._put_rows(
                    np.zeros((self.S, H, W), np.float32))
            gt_dev = self._gt_zero
        self.states, (idepth, stats) = batched_full_step(
            self.states, packed_dev, gt_dev, cam=self.cam,
            params=self.params, is_pf=is_pf, has_gt=has_gt)
        self.last_idepth = idepth
        self.last_stats = stats
        self._frame_count += 1
        if is_pf:
            if self.deferred:
                # Bounded pipeline with drop backpressure (mirrors
                # Flame._schedule_triangulation) — except in
                # multi-controller mode, whose blocking-install policy
                # (see update() head) keeps the queue at <= 1, so drops
                # cannot occur and every process decides identically.
                if (not self.blocking_installs
                        and len(self._pending_topo) >= 2):
                    self.topo_dropped += 1
                else:
                    self._ensure_pool()
                    # Watermark snapshotted at SUBMIT time: a delayed
                    # job must not stamp its (older) vertex snapshot
                    # with a newer frame id, or slots re-detected in the
                    # meantime would pass the stale-triangle gate.
                    self._pending_topo.append(self._tri_pool.submit(
                        self._build_topologies,
                        (self.states.vtx_uv, self.states.vtx_in_graph),
                        self._max_frame_id))
            else:
                self._install_topologies(self._build_topologies(
                    (self.states.vtx_uv, self.states.vtx_in_graph),
                    self._max_frame_id))
        return True

    def drain_topologies(self):
        """Block until every in-flight deferred topology is installed
        (call before reading final meshes/maps)."""
        while self._pending_topo:
            self._install_topologies(self._pending_topo.popleft().result())

    def shutdown(self):
        """Tear down the worker pool and abandon in-flight topology jobs
        (drain_topologies first if they must land). Safe to call twice;
        the runner remains usable (the pool lazily recreates)."""
        self._pending_topo.clear()
        if self._tri_pool is not None:
            self._tri_pool.shutdown(wait=False, cancel_futures=True)
            self._tri_pool = None

    def _ensure_pool(self):
        if self._tri_pool is None:
            from concurrent.futures import ThreadPoolExecutor
            # +1 worker for the deferred orchestrator task itself.
            self._tri_pool = ThreadPoolExecutor(
                max_workers=min(self.S, 8) + 1,
                thread_name_prefix="flame-ms-tri")

    def _build_topologies(self, graph_dev, wm: int):
        """Per-stream host Delaunay: ONE packed D2H for all streams, the
        Delaunay/incidence builds fan out on a thread pool, and all S
        packed topologies come back as one [S, ...] int32 batch.

        Multi-controller: each process pulls ONLY its addressable
        stream shards (a local D2H), triangulates its own streams, and
        returns {stream_id: packed_topology} — the per-host work split
        of a real multi-host run."""
        vtx_uv, vtx_in_graph = graph_dev
        N = self.params.engine.max_features
        buf_dev = jnp.concatenate(
            [vtx_uv.reshape(self.S, -1),
             vtx_in_graph.astype(jnp.float32)], axis=1)
        self._ensure_pool()
        builder = _HostTopologyBuilder(self.params)
        if self.multiprocess:
            rows = {}
            for shard in buf_dev.addressable_shards:
                sl = shard.index[0]
                data = np.asarray(shard.data)
                for j, s in enumerate(range(*sl.indices(self.S))):
                    rows[s] = data[j]
            ids = sorted(rows)
            topos = list(self._tri_pool.map(
                lambda s: builder.build(
                    rows[s][:2 * N].reshape(N, 2), rows[s][2 * N:] > 0.5,
                    wm), ids))
            return dict(zip(ids, topos))
        buf = np.asarray(buf_dev)
        uv = buf[:, :2 * N].reshape(self.S, N, 2)
        elig = buf[:, 2 * N:] > 0.5
        topos = list(self._tri_pool.map(
            lambda s: builder.build(uv[s], elig[s], wm), range(self.S)))
        return np.stack(topos)

    def _install_topologies(self, bufs):
        if isinstance(bufs, dict):
            # Multi-controller: this process supplies only its local
            # streams' topologies; the callback runs per addressable
            # shard only.
            L = len(next(iter(bufs.values())))
            sh = NamedSharding(self.mesh, P("stream", None))
            bufs_dev = jax.make_array_from_callback(
                (self.S, L), sh,
                lambda idx: np.stack(
                    [bufs[s] for s in range(*idx[0].indices(self.S))]))
        else:
            bufs_dev = (jax.device_put(bufs, self._row_sharding)
                        if self._row_sharding is not None
                        else jax.device_put(bufs))
        e = self.params.engine
        self.states = _batched_install(
            self.states, bufs_dev, T=e.max_triangles, E=e.max_edges,
            N=e.max_features, D=e.max_vertex_degree)

    def _pull_rows(self, arr) -> dict[int, np.ndarray]:
        """{stream_id: row} for every stream this process addresses."""
        if not self.multiprocess:
            h = np.asarray(arr)
            return {s: h[s] for s in range(self.S)}
        out = {}
        for shard in arr.addressable_shards:
            data = np.asarray(shard.data)
            for j, s in enumerate(range(*shard.index[0].indices(self.S))):
                out[s] = data[j]
        return out

    def flush_stats(self) -> list[dict]:
        """One D2H: per-stream stats dicts for the last frame (local
        streams only in multi-controller mode — missing entries are
        other hosts' streams)."""
        if self.last_stats is None:
            return []
        rows = self._pull_rows(self.last_stats)
        return [dict(zip(eng_mod.DEVICE_STATS_KEYS, map(float, rows[s])))
                for s in sorted(rows)]

    def get_idepth_maps(self) -> np.ndarray:
        if self.multiprocess:
            rows = self._pull_rows(self.last_idepth)
            return np.stack([rows[s] for s in sorted(rows)])
        return np.asarray(self.last_idepth)

    def get_meshes(self):
        """Per-stream compacted meshes (one packed D2H of the graph
        state): list of (uv [V,2], idepth [V], tris [M,3]).

        Triangles are gated on the stale-topology watermark — the same
        rule as the single-stream getters (Flame._tri_fresh,
        engine.py): a vertex slot re-detected AFTER the installed
        triangulation is a different feature at an unrelated pixel, so
        triangles referencing it are masked until the next install."""
        st = self.states
        N = st.vtx_x.shape[-1]
        T = st.tris.shape[-2]
        # ONE packed [S, ...] f32 buffer -> one D2H (seven separate
        # pulls cost seven link RTTs on a tunneled backend; same rule as
        # the engine's _schedule_triangulation pull). Integer fields
        # travel as BIT PATTERNS (bitcast, viewed back on host) — a
        # value cast to f32 stops round-tripping past 2^24, which would
        # silently corrupt the stale-triangle gate on long-lived
        # streams.
        bits = lambda x: jax.lax.bitcast_convert_type(x, jnp.float32)
        packed = jnp.concatenate([
            st.vtx_uv.reshape(self.S, -1),                       # 2N
            st.vtx_x,                                            # N
            st.vtx_in_graph.astype(jnp.float32),                 # N
            bits(st.tris.reshape(self.S, -1)),                   # 3T bits
            st.tri_valid.astype(jnp.float32),                    # T
            bits(st.feat.frame_id),                              # N bits
            bits(st.topo_frame_id)[:, None],                     # 1 bits
        ], axis=-1)
        rows = self._pull_rows(packed)
        out = []
        for s in sorted(rows):
            r = rows[s]
            o = 0
            uv = r[o:o + 2 * N].reshape(N, 2); o += 2 * N
            x = r[o:o + N]; o += N
            g = r[o:o + N] > 0.5; o += N
            tris = np.ascontiguousarray(r[o:o + 3 * T]).view(
                np.int32).reshape(T, 3); o += 3 * T
            tvv = r[o:o + T] > 0.5; o += T
            fid = np.ascontiguousarray(r[o:o + N]).view(np.int32); o += N
            wm = int(np.ascontiguousarray(r[o:o + 1]).view(np.int32)[0])
            v_same = fid <= wm
            tv = tvv & v_same[tris].all(-1)
            out.append((uv[g], x[g], tris[tv]))
        return out


class _HostTopologyBuilder:
    """Stateless per-stream topology build (Delaunay + incidence + pack),
    shared by the multi-stream runner's worker pool."""

    def __init__(self, params: FlameParams):
        self.params = params

    def build(self, uv: np.ndarray, eligible: np.ndarray,
              watermark: int = 2 ** 30) -> np.ndarray:
        from flame_ros_tpu.graph.delaunay import (triangulate,
                                                  edges_from_triangles)
        from flame_ros_tpu.ops import nltgv2 as reg_ops
        e = self.params.engine
        N, E, T = e.max_features, e.max_edges, e.max_triangles
        idx = np.flatnonzero(eligible)
        tris_pad = np.zeros((T, 3), np.int32)
        tv = np.zeros(T, bool)
        edges_pad = np.zeros((E, 2), np.int32)
        ev = np.zeros(E, bool)
        if len(idx) >= 3:
            tris_local = triangulate(uv[idx])
            edges_local = edges_from_triangles(tris_local)
            tris_g = idx[tris_local][:T]
            edges_g = idx[edges_local][:E]
            if len(tris_g):
                ymin = uv[tris_g, 1].min(axis=1)
                tris_g = tris_g[np.argsort(ymin, kind="stable")]
            tris_pad[:len(tris_g)] = tris_g
            tv[:len(tris_g)] = True
            edges_pad[:len(edges_g)] = edges_g
            ev[:len(edges_g)] = True
        inc_e, inc_s, keep = reg_ops.build_incidence(
            edges_pad, ev, N, e.max_vertex_degree)
        ev &= keep
        return np.concatenate([
            tris_pad.ravel(), tv.astype(np.int32),
            edges_pad.ravel(), ev.astype(np.int32),
            inc_e.ravel(), inc_s.astype(np.int32).ravel(),
            np.asarray([watermark], np.int32)])

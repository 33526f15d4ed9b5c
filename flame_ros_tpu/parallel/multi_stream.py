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
        last_idepth=s("stream", None, None),
        cell_err=s("stream", None, None),
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
            cam=cam, params=params, has_gt=False)
        return state, idepth, stats_vec[cov_idx]

    return jax.vmap(one)(states, img_pyrs, qs, ts, frame_ids)


def place(tree, shardings):
    """device_put a batched state onto the mesh."""
    return jax.tree.map(
        lambda x, sh: jax.device_put(x, sh), tree, shardings,
        is_leaf=lambda x: isinstance(x, (jnp.ndarray, np.ndarray)))

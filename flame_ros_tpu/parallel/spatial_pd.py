"""Spatially partitioned NLTGV2 primal-dual smoothing with halo exchange.

SURVEY §5.7/§5.8 map the reference's "context scaling" slot (keyframe
subsampling + spatial decimation, /root/reference/src/flame_nodelet.cc:632-633,
cfg/flame_nodelet.yaml:5-8) to sharding the Delaunay graph across devices
with halo exchange of boundary values. This module is that design, applied
to the per-frame hot loop (`ops/nltgv2.pd_iterate`):

- **Vertices are partitioned into P vertical image strips** (balanced
  u-coordinate quantiles over the live vertices, padded slots distributed
  evenly). Delaunay edges are spatially local, so nearly all edges fall
  inside one strip and the halo — the set of remote vertices referenced by
  a part's edges — is a thin boundary band.
- **Boundary edges are replicated** on every part that owns an endpoint.
  Each replica performs the identical dual update from identical inputs
  (the neighbor's extragradient primals arrive via the halo exchange), so
  the replicas stay bitwise consistent without a second, reverse exchange
  of adjoint contributions per sweep. (The alternative — unique edge
  ownership — needs the K^T partial sums shipped back to vertex owners
  every sweep: two collectives per sweep instead of one, for the same
  math.)
- **One halo exchange per sweep**: each part gathers its export set (the
  owned vertices some other part references) into [P-1] fixed [H, 3]
  blocks and ships them with `lax.ppermute` rotations inside `shard_map`;
  received blocks are concatenated after the owned vertices, so local
  edge lists index a single [Vl + (P-1)H, 3] array. Topology, export
  lists, and budgets are all static between poseframe installs — the
  sweep jits to the same fixed-shape program every frame.

Because each part holds *every* edge incident to its owned vertices, the
per-vertex adjoint K^T, the Pock–Chambolle diagonal preconditioners, and
the prox/extragradient steps are computed entirely locally and — with the
incidence lists emitted in global edge order — reduce in the same lane
order as the unsharded gather path: `pd_iterate_spatial` matches
`pd_iterate` to XLA FMA-contraction tolerance (~1e-8; the two programs
fuse differently, so exact bitwise equality is not guaranteed —
tests/test_spatial_pd.py).

Reference behavior being scaled: the NLTGV2-L1 smoothing knobs
(/root/reference/cfg/flame_nodelet.yaml:78-91) — the update rules are
identical to ops/nltgv2.py; only the layout and the collective pattern
differ.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class SpatialPartition(NamedTuple):
    """Host-built partition of a (fixed, padded) Delaunay graph.

    All arrays are numpy, rebuilt at triangulation (poseframe) rate.
    `n_parts = P`, `Vl` owned vertex slots per part, `H` halo budget per
    (source, dest) pair, `El` edge slots per part.
    """
    vtx_order: np.ndarray     # [P, Vl] int32: global vertex id per slot
    vtx_part: np.ndarray      # [V] int32: owning part of each global vtx
    vtx_slot: np.ndarray      # [V] int32: owned slot of each global vtx
    edges_l: np.ndarray       # [P, El, 2] int32 into [0, Vl + (P-1)H)
    edge_valid_l: np.ndarray  # [P, El] bool
    edge_gid: np.ndarray      # [P, El] int32 global edge id (-1 pad)
    export_idx: np.ndarray    # [P, P-1, H] int32 owned slots to send to
    #                           part (p + r) % P at ring offset r = 1..P-1
    dp: np.ndarray            # [P, El, 2] f32 p_i - p_j (pixels)
    alpha: np.ndarray         # [P, El] f32 (0 on padding)
    beta: np.ndarray          # [P, El] f32
    inc_edges: np.ndarray     # [P, Vl, D] int32 local edge ids
    inc_sign: np.ndarray      # [P, Vl, D] f32 +1 tail / -1 head / 0 pad


def build_spatial_partition(edges, edge_valid, vtx_uv, vtx_valid,
                            n_parts: int, *, halo_budget: int | None = None,
                            edge_budget: int | None = None,
                            max_degree: int = 16) -> SpatialPartition:
    """Partition the padded graph into `n_parts` vertical strips.

    `edge_valid` must already reflect the degree-budget filtering of
    `ops.nltgv2.build_incidence` (the engine's installed edge set), so
    every part sees exactly the edges the unsharded sweep sees.

    Budgets: `halo_budget` (H) and `edge_budget` (El) are padded static
    shapes; when None they are sized to the actual partition with a small
    headroom and rounded up to a multiple of 8. A partition exceeding an
    explicit budget raises — the caller owns recompile policy.
    """
    edges = np.asarray(edges)
    edge_valid = np.asarray(edge_valid, bool)
    vtx_uv = np.asarray(vtx_uv, np.float32)
    vtx_valid = np.asarray(vtx_valid, bool)
    V = len(vtx_uv)
    Pn = int(n_parts)
    if V % Pn:
        raise ValueError(f"V={V} not divisible by n_parts={Pn}")
    Vl = V // Pn

    # --- vertex buckets: u-quantile strips over live vertices ----------
    live = np.where(vtx_valid)[0]
    order = live[np.argsort(vtx_uv[live, 0], kind="stable")]
    chunks = np.array_split(order, Pn)
    dead = np.where(~vtx_valid)[0]
    vtx_order = np.zeros((Pn, Vl), np.int32)
    vtx_part = np.zeros(V, np.int32)
    vtx_slot = np.zeros(V, np.int32)
    d_at = 0
    for p in range(Pn):
        ids = list(chunks[p])
        room = Vl - len(ids)
        if room < 0:
            raise ValueError("strip overflow (live vertices unbalanced)")
        ids += list(dead[d_at:d_at + room])
        d_at += room
        ids = np.asarray(ids, np.int32)
        vtx_order[p] = ids
        vtx_part[ids] = p
        vtx_slot[ids] = np.arange(Vl, dtype=np.int32)

    # --- halo export sets: needed[s][r] = owned slots of part s that
    # part (s + r) % P references through its edges -----------------------
    needed = [[set() for _ in range(Pn)] for _ in range(Pn)]
    ev_ids = np.where(edge_valid)[0]
    for e in ev_ids:
        i, j = int(edges[e, 0]), int(edges[e, 1])
        pi, pj = int(vtx_part[i]), int(vtx_part[j])
        if pi != pj:
            needed[pj][(pi - pj) % Pn].add(int(vtx_slot[j]))   # pj -> pi
            needed[pi][(pj - pi) % Pn].add(int(vtx_slot[i]))   # pi -> pj
    h_req = max([1] + [len(needed[s][r]) for s in range(Pn)
                       for r in range(1, Pn)])
    H = halo_budget or -(-int(h_req * 1.25) // 8) * 8
    if h_req > H:
        raise ValueError(f"halo budget {H} < required {h_req}")
    export_idx = np.zeros((Pn, max(Pn - 1, 1), H), np.int32)
    halo_pos = [[{} for _ in range(Pn)] for _ in range(Pn)]  # [s][r]{slot:k}
    for s in range(Pn):
        for r in range(1, Pn):
            lst = sorted(needed[s][r])
            export_idx[s, r - 1, :len(lst)] = lst
            halo_pos[s][r] = {sl: k for k, sl in enumerate(lst)}

    # --- per-part edge lists (global edge order preserved, so incidence
    # reductions match the unsharded path bitwise) -----------------------
    def local_index(v: int, d: int) -> int:
        s = int(vtx_part[v])
        if s == d:
            return int(vtx_slot[v])
        r = (d - s) % Pn
        return Vl + (r - 1) * H + halo_pos[s][(d - s) % Pn][int(vtx_slot[v])]

    per_part = [[] for _ in range(Pn)]   # (gid, li, lj)
    for e in ev_ids:
        i, j = int(edges[e, 0]), int(edges[e, 1])
        owners = {int(vtx_part[i]), int(vtx_part[j])}
        for d in owners:
            per_part[d].append((int(e), local_index(i, d),
                                local_index(j, d)))
    e_req = max(1, max(len(pp) for pp in per_part))
    El = edge_budget or -(-int(e_req * 1.25) // 8) * 8
    if e_req > El:
        raise ValueError(f"edge budget {El} < required {e_req}")
    edges_l = np.zeros((Pn, El, 2), np.int32)
    edge_valid_l = np.zeros((Pn, El), bool)
    edge_gid = np.full((Pn, El), -1, np.int32)
    for p in range(Pn):
        for k, (gid, li, lj) in enumerate(per_part[p]):
            edges_l[p, k] = (li, lj)
            edge_gid[p, k] = gid
            edge_valid_l[p, k] = True

    # --- per-edge geometry (identical formula to ops.nltgv2.build_topology)
    ext_uv = np.zeros((Pn, Vl + (Pn - 1) * H, 2), np.float32)
    for p in range(Pn):
        ext_uv[p, :Vl] = vtx_uv[vtx_order[p]]
        for r in range(1, Pn):
            s = (p - r) % Pn
            src = vtx_order[s][export_idx[s, r - 1]]
            ext_uv[p, Vl + (r - 1) * H: Vl + r * H] = vtx_uv[src]
    dp = np.stack([ext_uv[p][edges_l[p, :, 0]] - ext_uv[p][edges_l[p, :, 1]]
                   for p in range(Pn)])
    dist = np.linalg.norm(dp, axis=-1)
    inv = np.where(edge_valid_l, 1.0 / np.maximum(dist, 1.0), 0.0)
    dp = dp.astype(np.float32)
    alpha = inv.astype(np.float32)
    beta = inv.astype(np.float32)

    # --- owned-vertex incidence over local edges (global edge order) ----
    inc_e = np.zeros((Pn, Vl, max_degree), np.int32)
    inc_s = np.zeros((Pn, Vl, max_degree), np.float32)
    for p in range(Pn):
        deg = np.zeros(Vl, np.int32)
        for k, (gid, li, lj) in enumerate(per_part[p]):
            for v, sign in ((li, 1.0), (lj, -1.0)):
                if v < Vl:
                    if deg[v] >= max_degree:
                        raise ValueError(
                            "degree overflow: pass the engine's filtered "
                            "edge set (build_incidence keep mask)")
                    inc_e[p, v, deg[v]] = k
                    inc_s[p, v, deg[v]] = sign
                    deg[v] += 1
    return SpatialPartition(
        vtx_order=vtx_order, vtx_part=vtx_part.astype(np.int32),
        vtx_slot=vtx_slot.astype(np.int32), edges_l=edges_l,
        edge_valid_l=edge_valid_l, edge_gid=edge_gid,
        export_idx=export_idx, dp=dp, alpha=alpha, beta=beta,
        inc_edges=inc_e, inc_sign=inc_s)


# ---------------------------------------------------------------------------
# Layout conversion helpers (scatter/gather across the partition).
# ---------------------------------------------------------------------------

def partition_vertex(part: SpatialPartition, x):
    """[V, ...] global -> [P, Vl, ...] partitioned (numpy or jax)."""
    return x[part.vtx_order]


def unpartition_vertex(part: SpatialPartition, xp):
    """[P, Vl, ...] -> [V, ...]: inverse of partition_vertex."""
    Pn, Vl = part.vtx_order.shape
    flat_ids = part.vtx_order.reshape(-1)
    out = jnp.zeros((Pn * Vl,) + xp.shape[2:], xp.dtype)
    return out.at[flat_ids].set(xp.reshape((Pn * Vl,) + xp.shape[2:]))


def partition_edges(part: SpatialPartition, qe):
    """[E, ...] per-edge global -> [P, El, ...] (pad rows take edge 0)."""
    gid = np.maximum(part.edge_gid, 0)
    return qe[gid] * part.edge_valid_l[(...,) + (None,) * (qe.ndim - 1)]


def unpartition_edges(part: SpatialPartition, qp, num_edges: int):
    """[P, El, ...] -> [E, ...]. Replicated edges carry identical values
    on every owner (deterministic duplicate dual updates), so any owner's
    copy is THE value; scatter order is irrelevant."""
    Pn, El = part.edge_gid.shape
    gid = jnp.asarray(part.edge_gid.reshape(-1))
    vals = qp.reshape((Pn * El,) + qp.shape[2:])
    # Padding rows (gid == -1) scatter out of bounds and are dropped.
    idx = jnp.where(gid >= 0, gid, num_edges)
    out = jnp.zeros((num_edges,) + qp.shape[2:], qp.dtype)
    return out.at[idx].set(vals, mode="drop")


# ---------------------------------------------------------------------------
# Device-side sharded primal-dual sweeps.
# ---------------------------------------------------------------------------

def _local_precond(alpha, beta, dp, inc_e, inc_s):
    """Pock–Chambolle diagonal steps from part-local arrays (identical
    formulas to ops.nltgv2._precond_steps; complete because every edge
    incident to an owned vertex is present locally)."""
    absa = jnp.abs(alpha)
    absb = jnp.abs(beta)
    adp1 = jnp.abs(alpha * dp[:, 0])
    adp2 = jnp.abs(alpha * dp[:, 1])
    row1 = absa + absa + adp1 + adp2
    row2 = absb + absb
    sigma = 1.0 / jnp.maximum(jnp.stack([row1, row2, row2], -1), 1e-6)
    live = (inc_s != 0).astype(jnp.float32)
    tail = (inc_s > 0).astype(jnp.float32)
    col_x = jnp.sum(live * absa[inc_e], -1)
    col_w1 = jnp.sum(live * (tail * (adp1[inc_e] + absb[inc_e])
                             + (1 - tail) * absb[inc_e]), -1)
    col_w2 = jnp.sum(live * (tail * (adp2[inc_e] + absb[inc_e])
                             + (1 - tail) * absb[inc_e]), -1)
    tau_x = 1.0 / jnp.maximum(col_x, 1e-6)
    tau_w = 1.0 / jnp.maximum(jnp.stack([col_w1, col_w2], -1), 1e-6)
    return sigma, tau_x, tau_w


@partial(jax.jit,
         static_argnames=("mesh", "axis", "num_iters", "theta", "unroll"))
def pd_iterate_spatial(mesh: Mesh, part_dev, xw, q, z, lam, vmask,
                       *, axis: str = "part", num_iters: int = 10,
                       theta: float = 1.0, unroll: int = 10):
    """Sharded primal-dual sweeps over the spatial partition.

    part_dev: SpatialPartition whose arrays are jax arrays sharded
    [P, ...] over `axis` (see `shard_partition`); xw [P, Vl, 3] packed
    (x, w1, w2); q [P, El, 3]; z/lam/vmask [P, Vl].

    One sweep = ONE halo exchange (P-1 ppermute rotations of [H, 3]
    blocks of extragradient primals) + the exact ops/nltgv2 packed-path
    update arithmetic on part-local data. Returns (xw, q) in the same
    layout, bitwise equal to the unsharded gather-path `pd_iterate`.
    """
    Pn = mesh.shape[axis]
    Vl = xw.shape[1]
    H = part_dev.export_idx.shape[-1]

    spec_v = P(axis, *([None] * 2))
    specs = SpatialPartition(
        vtx_order=P(axis, None), vtx_part=None, vtx_slot=None,
        edges_l=P(axis, None, None), edge_valid_l=P(axis, None),
        edge_gid=P(axis, None), export_idx=P(axis, None, None),
        dp=P(axis, None, None), alpha=P(axis, None), beta=P(axis, None),
        inc_edges=P(axis, None, None), inc_sign=P(axis, None, None))

    def run(pt: SpatialPartition, xw, q, z, lam, vmask):
        # Block views arrive with a leading shard dim of 1.
        edges = pt.edges_l[0]
        ev = pt.edge_valid_l[0][:, None].astype(xw.dtype)
        alpha, beta, dp = pt.alpha[0], pt.beta[0], pt.dp[0]
        exp_idx = pt.export_idx[0]
        inc_e, inc_s = pt.inc_edges[0], pt.inc_sign[0]
        xw, q = xw[0], q[0]
        z, lam, vmask = z[0], lam[0], vmask[0]

        sigma, tau_x, tau_w = _local_precond(alpha, beta, dp, inc_e, inc_s)
        tau_xw = jnp.concatenate([tau_x[:, None], tau_w], -1)
        thr = tau_x * lam
        vm3 = vmask.astype(xw.dtype)[:, None]
        i, j = edges[:, 0], edges[:, 1]
        live = (inc_s != 0).astype(xw.dtype)
        tail = (inc_s > 0).astype(xw.dtype)
        dp_inc = dp[inc_e] * live[..., None]
        sgn = inc_s

        def exchange(xwb):
            blocks = [xwb]
            for r in range(1, Pn):
                buf = xwb[exp_idx[r - 1]]                    # [H, 3]
                perm = [(s, (s + r) % Pn) for s in range(Pn)]
                blocks.append(jax.lax.ppermute(buf, axis, perm))
            return jnp.concatenate(blocks, axis=0)

        def body(_, carry):
            xw, xwb, q = carry
            xwb_ext = exchange(xwb)                          # [Vl+(P-1)H, 3]
            pi_ = xwb_ext[i]
            pj_ = xwb_ext[j]
            k1 = (alpha * (pi_[:, 0] - pj_[:, 0])
                  - alpha * dp[:, 0] * pi_[:, 1]
                  - alpha * dp[:, 1] * pi_[:, 2])
            kw = beta[:, None] * (pi_[:, 1:] - pj_[:, 1:])
            Kx = jnp.concatenate([k1[:, None], kw], -1)
            q = jnp.clip(q + sigma * Kx, -1.0, 1.0) * ev
            # Adjoint for OWNED vertices only (complete: every incident
            # edge is local), via the packed incidence gather.
            Pq = jnp.concatenate([(alpha * q[:, 0])[:, None],
                                  beta[:, None] * q[:, 1:]], -1)
            Pv = Pq[inc_e]                                    # [Vl, D, 3]
            gx = jnp.sum(live * sgn * Pv[..., 0], -1)
            gw = jnp.sum(
                tail[..., None] * (-Pv[..., 0:1] * dp_inc + Pv[..., 1:])
                - ((live - tail)[..., None]) * Pv[..., 1:], axis=1)
            g = jnp.concatenate([gx[:, None], gw], -1)
            xw_desc = xw - tau_xw * g
            r_ = xw_desc[:, 0] - z
            x_new = z + jnp.sign(r_) * jnp.maximum(jnp.abs(r_) - thr, 0.0)
            xw_new = jnp.concatenate([x_new[:, None], xw_desc[:, 1:]], -1)
            xw_new = vm3 * xw_new + (1 - vm3) * xw
            xwb = xw_new + theta * (xw_new - xw)
            return (xw_new, xwb, q)

        xw, xwb, q = jax.lax.fori_loop(
            0, num_iters, body, (xw, xw, q),
            unroll=min(num_iters, max(unroll, 1)))
        return xw[None], q[None]

    sharded = jax.shard_map(
        run, mesh=mesh,
        in_specs=(specs, spec_v, P(axis, None, None), P(axis, None),
                  P(axis, None), P(axis, None)),
        out_specs=(spec_v, P(axis, None, None)))
    pt = part_dev._replace(vtx_part=None, vtx_slot=None)
    return sharded(pt, xw, q, z, lam, vmask)


@partial(jax.jit, static_argnames=("mesh", "stream_axis", "part_axis",
                                   "num_iters", "theta", "gate_tol",
                                   "unroll"))
def pd_iterate_spatial_batched(mesh: Mesh, parts: SpatialPartition,
                               xw, q, edge_live, uv, z, lam, vmask, *,
                               stream_axis: str = "stream",
                               part_axis: str = "part",
                               num_iters: int = 10, theta: float = 1.0,
                               gate_tol: float = 0.0, unroll: int = 10):
    """Multi-stream product-path variant of `pd_iterate_spatial`: the
    NLTGV2 sweep of `models.engine._smooth_step`, sharded over a
    ("stream", "part") mesh (SURVEY §5.7-5.8; the engine integration
    lives in parallel/multi_stream.batched_full_step_spatial).

    Differences from the single-stream op above:
    - leading stream axis on every array (xw [S, P, Vl, 3], q
      [S, P, El, 3], z/lam/vmask [S, P, Vl]; `parts` arrays [S, P, ...]),
      sharded over `stream_axis`; halo ppermutes ride `part_axis` only,
      so each stream shard's part group exchanges independently;
    - `edge_live` [S, P, El]: the per-frame stale-topology mask
      (engine._smooth_pd_setup edge_fresh, gathered to part layout).
      Masked edges get alpha = beta = 0 and zeroed duals — identical
      semantics to `reg_ops.build_topology` on the unsharded path;
    - `uv` [S, P, Vl, 2]: CURRENT vertex pixel positions (owned slots,
      state.vtx_uv gathered by vtx_order). Graph vertices RE-PROJECT
      every frame, so per-edge geometry (dp, alpha, beta) is rebuilt
      here per frame — one extra halo exchange of positions before the
      sweep loop — exactly as the unsharded path rebuilds
      build_topology from state.vtx_uv each frame. The install-time
      parts.dp/alpha/beta fields are NOT used on this path;
    - `gate_tol` > 0 reproduces the engine's convergence-gated sweeps:
      per-stream max-|dx| deltas (pmax over the part group) drive a
      batched while-loop with per-stream select masking — the same
      semantics jax gives the vmapped gated `pd_iterate`.
    """
    Pn = mesh.shape[part_axis]

    specs = SpatialPartition(
        vtx_order=P(stream_axis, part_axis, None), vtx_part=None,
        vtx_slot=None,
        edges_l=P(stream_axis, part_axis, None, None),
        edge_valid_l=P(stream_axis, part_axis, None),
        edge_gid=P(stream_axis, part_axis, None),
        export_idx=P(stream_axis, part_axis, None, None),
        # dp/alpha/beta: install-time edge geometry, UNUSED here (the
        # sweep rebuilds geometry from current uv each frame) — stripped
        # below so callers never ship them.
        dp=None, alpha=None, beta=None,
        inc_edges=P(stream_axis, part_axis, None, None),
        inc_sign=P(stream_axis, part_axis, None, None))
    spec_v3 = P(stream_axis, part_axis, None, None)
    spec_v = P(stream_axis, part_axis, None)

    def run(pt: SpatialPartition, xw, q, el, uv, z, lam, vmask):
        # Blocks arrive [Sl, 1, ...]: squeeze the part dim, vmap one
        # sweep over the local stream block (collectives batch fine).
        sq = lambda a: a[:, 0]
        edges = sq(pt.edges_l)
        exp_idx = sq(pt.export_idx)
        inc_e, inc_s = sq(pt.inc_edges), sq(pt.inc_sign)
        elf = sq(el).astype(xw.dtype)
        xw, q, uv = sq(xw), sq(q), sq(uv)
        z, lam, vmask = sq(z), sq(lam), sq(vmask)

        # Per-frame edge geometry from CURRENT positions (one halo
        # exchange of uv, loop-invariant): dp raw, alpha/beta masked by
        # the live set — bit-matching reg_ops.build_topology.
        def geom(exp_idx, uv, edges, elf):
            blocks = [uv]
            for r in range(1, Pn):
                buf = uv[exp_idx[r - 1]]
                perm = [(s, (s + r) % Pn) for s in range(Pn)]
                blocks.append(jax.lax.ppermute(buf, part_axis, perm))
            uv_ext = jnp.concatenate(blocks, axis=0)
            dpv = uv_ext[edges[:, 0]] - uv_ext[edges[:, 1]]
            dist = jnp.linalg.norm(dpv, axis=-1)
            inv = jnp.where(elf > 0, 1.0 / jnp.maximum(dist, 1.0), 0.0)
            return dpv, inv

        dp, alpha = jax.vmap(geom)(exp_idx, uv, edges, elf)
        beta = alpha

        # Loop-invariant prep, hoisted OUT of the sweep (the unsharded
        # sibling pd_iterate_spatial does the same): the preconditioner
        # reductions and the dp[inc_e] gather cost as much as the
        # adjoint itself, and XLA does not reliably hoist them out of
        # the while_loop body below.
        def prep(inc_e, inc_s, alpha, beta, dp, lam, vmask):
            sigma, tau_x, tau_w = _local_precond(alpha, beta, dp,
                                                 inc_e, inc_s)
            tau_xw = jnp.concatenate([tau_x[:, None], tau_w], -1)
            thr = tau_x * lam
            vm3 = vmask.astype(jnp.float32)[:, None]
            live = (inc_s != 0).astype(jnp.float32)
            tail = (inc_s > 0).astype(jnp.float32)
            dp_inc = dp[inc_e] * live[..., None]
            return sigma, tau_xw, thr, vm3, live, tail, dp_inc

        sigma_v, tau_xw_v, thr_v, vm3_v, live_v, tail_v, dp_inc_v = \
            jax.vmap(prep, in_axes=(0,) * 7)(
                inc_e, inc_s, alpha, beta, dp, lam, vmask)

        def sweep(edges, exp_idx, inc_e, inc_s, alpha, beta, dp, elf,
                  z, sigma, tau_xw, thr, vm3, live, tail, dp_inc,
                  xw, xwb, q):
            i, j = edges[:, 0], edges[:, 1]

            blocks = [xwb]
            for r in range(1, Pn):
                buf = xwb[exp_idx[r - 1]]
                perm = [(s, (s + r) % Pn) for s in range(Pn)]
                blocks.append(jax.lax.ppermute(buf, part_axis, perm))
            xwb_ext = jnp.concatenate(blocks, axis=0)

            pi_, pj_ = xwb_ext[i], xwb_ext[j]
            k1 = (alpha * (pi_[:, 0] - pj_[:, 0])
                  - alpha * dp[:, 0] * pi_[:, 1]
                  - alpha * dp[:, 1] * pi_[:, 2])
            kw = beta[:, None] * (pi_[:, 1:] - pj_[:, 1:])
            Kx = jnp.concatenate([k1[:, None], kw], -1)
            q = jnp.clip(q + sigma * Kx, -1.0, 1.0) * elf[:, None]
            Pq = jnp.concatenate([(alpha * q[:, 0])[:, None],
                                  beta[:, None] * q[:, 1:]], -1)
            Pv = Pq[inc_e]
            gx = jnp.sum(live * inc_s * Pv[..., 0], -1)
            gw = jnp.sum(
                tail[..., None] * (-Pv[..., 0:1] * dp_inc + Pv[..., 1:])
                - ((live - tail)[..., None]) * Pv[..., 1:], axis=1)
            g = jnp.concatenate([gx[:, None], gw], -1)
            xw_desc = xw - tau_xw * g
            r_ = xw_desc[:, 0] - z
            x_new = z + jnp.sign(r_) * jnp.maximum(jnp.abs(r_) - thr, 0.0)
            xw_new = jnp.concatenate([x_new[:, None], xw_desc[:, 1:]], -1)
            xw_new = vm3 * xw_new + (1 - vm3) * xw
            xwb_new = xw_new + theta * (xw_new - xw)
            delta = jnp.max(jnp.abs(xw_new[:, 0] - xw[:, 0]))
            return xw_new, xwb_new, q, delta

        sweep_v = jax.vmap(sweep, in_axes=(0,) * 19)
        consts = (edges, exp_idx, inc_e, inc_s, alpha, beta, dp, elf,
                  z, sigma_v, tau_xw_v, thr_v, vm3_v, live_v, tail_v,
                  dp_inc_v)

        if gate_tol > 0.0:
            Sl = xw.shape[0]

            # Mark loop scalars varying over BOTH mesh axes up front:
            # pmax makes values axis-invariant while the data carries
            # stay varying, and while_loop requires carry vma types to
            # match exactly.
            vary = lambda a: jax.lax.pcast(
                a, (stream_axis, part_axis), to="varying")
            vary_a = lambda a, ax: jax.lax.pcast(a, ax, to="varying")

            def wcond(c):
                cont, *_ = c
                return cont > 0

            def wbody(c):
                cont, k, xw, xwb, q, delta = c
                act = (k < num_iters) & (delta > gate_tol)     # [Sl]
                nxw, nxwb, nq, nd = sweep_v(*consts, xw, xwb, q)
                nd = vary_a(jax.lax.pmax(nd, part_axis), part_axis)
                m3 = act[:, None, None]
                xw = jnp.where(m3, nxw, xw)
                xwb = jnp.where(m3, nxwb, xwb)
                q = jnp.where(m3, nq, q)
                delta = jnp.where(act, nd, delta)
                k = k + act.astype(jnp.int32)
                # The trip decision must be UNIFORM across the WHOLE
                # mesh: the halo collective inside the loop body is one
                # program-wide op, so any group exiting early deadlocks
                # the rest (XLA CPU rendezvous requires all devices;
                # TPU would mismatch collective counts). pmax over the
                # stream axis makes all devices loop together;
                # converged streams keep looping as masked no-ops —
                # exactly the semantics vmap gives the unsharded gated
                # sweep.
                more = jnp.any((k < num_iters) & (delta > gate_tol))
                cont = vary_a(
                    jax.lax.pmax(more.astype(jnp.int32), stream_axis),
                    stream_axis)
                return (cont, k, xw, xwb, q, delta)

            _, _, xw, xwb, q, _ = jax.lax.while_loop(
                wcond, wbody,
                (vary(jnp.int32(1)), vary(jnp.zeros((Sl,), jnp.int32)),
                 xw, xw, q,
                 vary(jnp.full((Sl,), jnp.inf, jnp.float32))))
        else:
            def body(_, c):
                xw, xwb, q = c
                nxw, nxwb, nq, _ = sweep_v(*consts, xw, xwb, q)
                return (nxw, nxwb, nq)

            xw, xwb, q = jax.lax.fori_loop(
                0, num_iters, body, (xw, xw, q),
                unroll=min(num_iters, max(unroll, 1)))
        return xw[:, None], q[:, None]

    sharded = jax.shard_map(
        run, mesh=mesh,
        in_specs=(specs, spec_v3, spec_v3, spec_v, spec_v3, spec_v,
                  spec_v, spec_v),
        out_specs=(spec_v3, spec_v3))
    pt = parts._replace(vtx_part=None, vtx_slot=None,
                        dp=None, alpha=None, beta=None)
    return sharded(pt, xw, q, edge_live, uv, z, lam, vmask)


def shard_partition(mesh: Mesh, part: SpatialPartition,
                    axis: str = "part") -> SpatialPartition:
    """Place the partition's arrays on the mesh, leading dim sharded."""
    def put(x, spec):
        return jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))
    return SpatialPartition(
        vtx_order=put(part.vtx_order, P(axis, None)),
        vtx_part=part.vtx_part, vtx_slot=part.vtx_slot,
        edges_l=put(part.edges_l, P(axis, None, None)),
        edge_valid_l=put(part.edge_valid_l, P(axis, None)),
        edge_gid=put(part.edge_gid, P(axis, None)),
        export_idx=put(part.export_idx, P(axis, None, None)),
        dp=put(part.dp, P(axis, None, None)),
        alpha=put(part.alpha, P(axis, None)),
        beta=put(part.beta, P(axis, None)),
        inc_edges=put(part.inc_edges, P(axis, None, None)),
        inc_sign=put(part.inc_sign, P(axis, None, None)))

"""NLTGV2-L1 variational smoothing over the Delaunay graph, on device.

The regularization core of FLaME (reference: `do_nltgv2` + the nltgv2
parameter tree — cfg/flame_nodelet.yaml:78-91, SURVEY §2.9): per-vertex
inverse depth x_i and plane gradient w_i = (w1, w2), per-edge dual q_ij in
R^3, minimizing

    sum_ij  alpha_ij |x_i - x_j - <w_i, p_i - p_j>|
          + beta_ij (|w_i1 - w_j1| + |w_i2 - w_j2|)
          + sum_i lambda_i |x_i - z_i|

(non-local total generalized variation, 2nd order, Ranftl et al., with an
L1 data term robust to epipolar-filter outliers) by a first-order
primal-dual method (Chambolle–Pock): dual ascent + clip onto the L-inf
ball, primal descent + soft-shrinkage toward the measurements z, and an
extra-gradient step theta — the reference's step_x/step_q/theta knobs.

TPU design: the graph lives as fixed-shape edge lists ([E,2] int32 with a
validity mask); one iteration is two gathers, a handful of fused VPU ops,
and two segment-sums — no data-dependent shapes, so the whole
`pd_iterate` loop jits into a single XLA while-loop that runs every frame
between (host-side, poseframe-rate) retriangulations. Edge weights use
alpha_ij = beta_ij = 1/|p_i - p_j| which normalizes the operator so
diagonal (Pock-Chambolle 2011) preconditioning keeps the iteration
unconditionally stable for any mesh geometry; the reference's fixed
step_x/step_q are honored in the optional unpreconditioned mode.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class GraphState(NamedTuple):
    """Primal/dual variables. Vertex arrays [V]-shaped, edge arrays [E]."""
    x: jax.Array        # [V] smoothed inverse depth
    w: jax.Array        # [V, 2] plane gradients
    q: jax.Array        # [E, 3] duals
    x_bar: jax.Array    # [V] extragradient iterate
    w_bar: jax.Array    # [V, 2]


class GraphTopology(NamedTuple):
    """Static-shape graph: padded edge list + per-edge geometry.

    `inc_edges`/`inc_sign` are the transpose structure: for each vertex, up
    to D incident edge ids with +1 (vertex is the edge tail i) or -1 (head
    j), 0-sign padding. With them the adjoint K^T is pure gathers — TPU
    scatters serialize, and the primal-dual loop runs every frame.
    """
    edges: jax.Array      # [E, 2] int32 (i, j); padding rows point at 0
    edge_valid: jax.Array  # [E] bool
    dp: jax.Array         # [E, 2] p_i - p_j (pixels)
    alpha: jax.Array      # [E] first-order weight (0 on padding)
    beta: jax.Array       # [E] second-order weight
    inc_edges: jax.Array = None  # [V, D] int32
    inc_sign: jax.Array = None   # [V, D] float32 (+1 tail / -1 head / 0 pad)


def build_incidence(edges: "np.ndarray", edge_valid: "np.ndarray",
                    num_vertices: int, max_degree: int = 16):
    """Host-side incidence builder (numpy; runs at triangulation rate).

    Returns (inc_edges [V, D], inc_sign [V, D], keep_edge [E]): edges
    beyond a vertex's degree budget are reported in keep_edge=False so the
    caller can invalidate them — K and K^T must see the same edge set.
    """
    import numpy as np
    E = len(edges)
    inc_e = np.zeros((num_vertices, max_degree), np.int32)
    inc_s = np.zeros((num_vertices, max_degree), np.float32)
    deg = np.zeros(num_vertices, np.int32)
    keep = np.asarray(edge_valid, bool).copy()
    for e in range(E):
        if not keep[e]:
            continue
        i, j = int(edges[e, 0]), int(edges[e, 1])
        if deg[i] >= max_degree or deg[j] >= max_degree:
            keep[e] = False
            continue
        inc_e[i, deg[i]] = e
        inc_s[i, deg[i]] = 1.0
        deg[i] += 1
        inc_e[j, deg[j]] = e
        inc_s[j, deg[j]] = -1.0
        deg[j] += 1
    return inc_e, inc_s, keep


def build_topology(edges, edge_valid, vtx_pos, inc_edges=None,
                   inc_sign=None):
    """Compute per-edge geometry/weights from vertex positions.

    edges: [E, 2] int32, edge_valid: [E] bool, vtx_pos: [V, 2] float32.
    """
    pi = vtx_pos[edges[:, 0]]
    pj = vtx_pos[edges[:, 1]]
    dp = pi - pj
    dist = jnp.linalg.norm(dp, axis=-1)
    inv = jnp.where(edge_valid, 1.0 / jnp.maximum(dist, 1.0), 0.0)
    return GraphTopology(edges=edges, edge_valid=edge_valid, dp=dp,
                         alpha=inv, beta=inv, inc_edges=inc_edges,
                         inc_sign=inc_sign)


def build_gcat(edges, edge_valid, num_vertices: int):
    """Signed-incidence gather matrix for the MXU adjoint: [V, 2E] bf16
    with G[v, e] = 1 where v is edge e's tail and G[v, E+e] = 1 where v is
    its head (invalid edges zero). The 0/1 entries are EXACT in bf16.

    With it, K^T q becomes ONE [V, 2E] @ [2E, 3] matmul over per-edge
    tail/head contribution vectors — on TPU this replaces the [V, D, 3]
    incidence gather, whose random HBM reads dominate the sweep cost
    (measured 3.5 -> 1.6 ms for 10 sweeps at V=2048/E=6144 on v5e).
    Built by two scatters (a broadcast-compare build costs ~57 ms on
    device); runs inside the per-frame dispatch where XLA CSEs the
    identical builds across a window's frames."""
    E = edges.shape[0]
    evf = edge_valid.astype(jnp.bfloat16)
    g = jnp.zeros((num_vertices, 2 * E), jnp.bfloat16)
    g = g.at[edges[:, 0], jnp.arange(E)].set(evf)
    g = g.at[edges[:, 1], E + jnp.arange(E)].set(evf)
    return g


def init_graph_state(x0, w0=None, q0=None):
    V = x0.shape[0]
    w = jnp.zeros((V, 2), x0.dtype) if w0 is None else w0
    E = None
    if q0 is None:
        raise ValueError("q0 (dual init, [E,3]) is required")
    return GraphState(x=x0, w=w, q=q0, x_bar=x0, w_bar=w)


def _K_apply(top: GraphTopology, x, w):
    """Edge operator K(x, w) -> [E, 3]."""
    i, j = top.edges[:, 0], top.edges[:, 1]
    k1 = top.alpha * (x[i] - x[j]
                      - w[i, 0] * top.dp[:, 0] - w[i, 1] * top.dp[:, 1])
    k2 = top.beta * (w[i, 0] - w[j, 0])
    k3 = top.beta * (w[i, 1] - w[j, 1])
    return jnp.stack([k1, k2, k3], axis=-1)


def _KT_apply(top: GraphTopology, q, num_vertices: int):
    """Adjoint K^T q -> (gx [V], gw [V,2])."""
    if top.inc_edges is not None:
        # Gather formulation over the incidence lists (no scatters).
        e = top.inc_edges                       # [V, D]
        s = top.inc_sign                        # [V, D]
        tail = (s > 0).astype(q.dtype)
        live = (s != 0).astype(q.dtype)
        a_q1 = (top.alpha * q[:, 0])[e]
        b_q2 = (top.beta * q[:, 1])[e]
        b_q3 = (top.beta * q[:, 2])[e]
        gx = jnp.sum(live * s * a_q1, axis=-1)
        gw1 = jnp.sum(live * (tail * (-a_q1 * top.dp[:, 0][e] + b_q2)
                              - (1 - tail) * b_q2), axis=-1)
        gw2 = jnp.sum(live * (tail * (-a_q1 * top.dp[:, 1][e] + b_q3)
                              - (1 - tail) * b_q3), axis=-1)
        return gx, jnp.stack([gw1, gw2], axis=-1)
    i, j = top.edges[:, 0], top.edges[:, 1]
    a_q1 = top.alpha * q[:, 0]
    b_q2 = top.beta * q[:, 1]
    b_q3 = top.beta * q[:, 2]
    gx = (jnp.zeros(num_vertices, q.dtype)
          .at[i].add(a_q1).at[j].add(-a_q1))
    gw1 = (jnp.zeros(num_vertices, q.dtype)
           .at[i].add(-a_q1 * top.dp[:, 0] + b_q2).at[j].add(-b_q2))
    gw2 = (jnp.zeros(num_vertices, q.dtype)
           .at[i].add(-a_q1 * top.dp[:, 1] + b_q3).at[j].add(-b_q3))
    return gx, jnp.stack([gw1, gw2], axis=-1)


def _precond_steps(top: GraphTopology, num_vertices: int):
    """Pock-Chambolle diagonal preconditioners (a=1):
    sigma_row = 1/sum|K_row|, tau_col = 1/sum|K_col|."""
    absa = jnp.abs(top.alpha)
    absb = jnp.abs(top.beta)
    adp1 = jnp.abs(top.alpha * top.dp[:, 0])
    adp2 = jnp.abs(top.alpha * top.dp[:, 1])
    # Row sums (per edge, per dual component).
    row1 = absa + absa + adp1 + adp2
    row2 = absb + absb
    row3 = row2
    sigma = 1.0 / jnp.maximum(jnp.stack([row1, row2, row3], -1), 1e-6)
    # Column sums (per primal variable).
    if top.inc_edges is not None:
        e = top.inc_edges
        s = top.inc_sign
        live = (s != 0).astype(jnp.float32)
        tail = (s > 0).astype(jnp.float32)
        col_x = jnp.sum(live * absa[e], -1)
        col_w1 = jnp.sum(live * (tail * (adp1[e] + absb[e])
                                 + (1 - tail) * absb[e]), -1)
        col_w2 = jnp.sum(live * (tail * (adp2[e] + absb[e])
                                 + (1 - tail) * absb[e]), -1)
    else:
        i, j = top.edges[:, 0], top.edges[:, 1]
        col_x = (jnp.zeros(num_vertices).at[i].add(absa).at[j].add(absa))
        col_w1 = (jnp.zeros(num_vertices)
                  .at[i].add(adp1 + absb).at[j].add(absb))
        col_w2 = (jnp.zeros(num_vertices)
                  .at[i].add(adp2 + absb).at[j].add(absb))
    tau_x = 1.0 / jnp.maximum(col_x, 1e-6)
    tau_w = 1.0 / jnp.maximum(jnp.stack([col_w1, col_w2], -1), 1e-6)
    return sigma, tau_x, tau_w


@partial(jax.jit, static_argnames=("num_iters", "precondition",
                                   "gate_tol"))
def pd_iterate(state: GraphState, top: GraphTopology, z, lam, vtx_valid,
               gcat=None, *, num_iters: int = 10, step_x: float = 0.001,
               step_q: float = 125.0, theta: float = 1.0,
               precondition: bool = True, gate_tol: float = 0.0):
    """Run up to `num_iters` primal-dual sweeps.

    z: [V] measured inverse depths (data term anchors);
    lam: [V] per-vertex data weights (lambda_i, already includes
    data_factor and any adaptive/rescale handling);
    vtx_valid: [V] bool — frozen vertices pass through unchanged;
    gcat: optional [V, 2E] bf16 incidence matrix (see build_gcat) — when
    given, the adjoint K^T runs as one MXU matmul per sweep instead of
    the incidence gather (the TPU product path; edge contributions round
    to bf16, a ~4e-4 absolute perturbation of the converged primal,
    measured well under the filter/measurement noise floor).

    gate_tol > 0 enables CONVERGENCE-GATED sweeps (packed incidence path
    only — the product path): the loop exits early once the sweep's max
    primal-x change falls below gate_tol. The engine warm-starts x/w/q
    from the previous frame, so steady-state frames between poseframes
    are typically 1-2 sweeps from their fixed point and the remaining
    sweeps are pure waste. Trade-off: a while-loop cannot unroll (each
    sweep becomes an XLA loop barrier) and pays one [V] reduction per
    sweep — profitable only when the expected sweep count is well below
    num_iters; measured on-chip before being made a default
    (BENCH_NOTES round 3)."""
    V = state.x.shape[0]
    if precondition:
        sigma, tau_x, tau_w = _precond_steps(top, V)
        # theta from the reference acts as the extra-gradient weight.
    else:
        sigma = jnp.full((top.edges.shape[0], 3), step_q)
        tau_x = jnp.full((V,), step_x)
        tau_w = jnp.full((V, 2), step_x)

    vmask = vtx_valid.astype(state.x.dtype)

    if top.inc_edges is not None:
        # Packed fast path: primals live as one [V, 3] array (x, w1, w2)
        # and all loop-invariant incidence gathers hoist out of the sweep,
        # so one iteration is 2 edge gathers + 1 vertex gather + fused
        # arithmetic (the sweep runs every frame; op-count is the cost).
        i = top.edges[:, 0]
        j = top.edges[:, 1]
        ev = top.edge_valid[:, None].astype(state.x.dtype)
        e = top.inc_edges
        sgn = top.inc_sign
        live = (sgn != 0).astype(state.x.dtype)
        tail = (sgn > 0).astype(state.x.dtype)
        alpha_inc = top.alpha[e] * live
        dp_inc = top.dp[e] * live[..., None]
        edge_k1w = jnp.concatenate(
            [top.alpha[:, None], top.alpha[:, None] * top.dp], -1)  # [E,3]
        tau_xw = jnp.concatenate([tau_x[:, None], tau_w], -1)       # [V,3]
        thr = tau_x * lam
        vm3 = vmask[:, None]

        def pack(x, w):
            return jnp.concatenate([x[:, None], w], -1)

        xw0 = pack(state.x, state.w)
        xwb0 = pack(state.x_bar, state.w_bar)

        def body(_, carry):
            xw, xwb, q = carry
            pi = xwb[i]                      # [E, 3]
            pj = xwb[j]
            k1 = (edge_k1w[:, 0] * (pi[:, 0] - pj[:, 0])
                  - edge_k1w[:, 1] * pi[:, 1] - edge_k1w[:, 2] * pi[:, 2])
            kw = top.beta[:, None] * (pi[:, 1:] - pj[:, 1:])
            Kx = jnp.concatenate([k1[:, None], kw], -1)
            q = jnp.clip(q + sigma * Kx, -1.0, 1.0) * ev
            if gcat is not None:
                # Adjoint as ONE MXU matmul over stacked tail/head
                # contributions (f32 accumulate).
                a_q1 = top.alpha * q[:, 0]
                bq = top.beta[:, None] * q[:, 1:]
                t_tail = jnp.concatenate(
                    [a_q1[:, None], -a_q1[:, None] * top.dp + bq], -1)
                t_head = jnp.concatenate([-a_q1[:, None], -bq], -1)
                tcat = jnp.concatenate([t_tail, t_head], 0)  # [2E, 3]
                g = jnp.dot(gcat, tcat.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
            else:
                # Adjoint via one packed vertex gather.
                P = jnp.concatenate([(top.alpha * q[:, 0])[:, None],
                                     top.beta[:, None] * q[:, 1:]], -1)
                Pv = P[e]                        # [V, D, 3]
                gx = jnp.sum(live * sgn * Pv[..., 0], -1)
                gw = jnp.sum(
                    tail[..., None] * (-Pv[..., 0:1] * dp_inc + Pv[..., 1:])
                    - ((live - tail)[..., None]) * Pv[..., 1:], axis=1)
                g = jnp.concatenate([gx[:, None], gw], -1)
            xw_desc = xw - tau_xw * g
            r = xw_desc[:, 0] - z
            x_new = z + jnp.sign(r) * jnp.maximum(jnp.abs(r) - thr, 0.0)
            xw_new = jnp.concatenate([x_new[:, None], xw_desc[:, 1:]], -1)
            xw_new = vm3 * xw_new + (1 - vm3) * xw
            xwb = xw_new + theta * (xw_new - xw)
            return (xw_new, xwb, q)

        if gate_tol > 0.0:
            def cond(carry):
                k, xw, xwb, q, delta = carry
                return (k < num_iters) & (delta > gate_tol)

            def wbody(carry):
                k, xw, xwb, q, _ = carry
                xw_new, xwb, q = body(None, (xw, xwb, q))
                delta = jnp.max(jnp.abs(xw_new[:, 0] - xw[:, 0]))
                return (k + 1, xw_new, xwb, q, delta)

            _, xw, xwb, q, _ = jax.lax.while_loop(
                cond, wbody, (jnp.int32(0), xw0, xwb0, state.q,
                              jnp.float32(jnp.inf)))
            return GraphState(x=xw[:, 0], w=xw[:, 1:], q=q,
                              x_bar=xwb[:, 0], w_bar=xwb[:, 1:])

        # Unrolled sweeps (capped: tests run hundreds of iterations):
        # each fori_loop iteration is an XLA while-loop barrier that
        # blocks fusion across sweeps — unrolling measured 15.4 -> 14.5
        # ms/frame on the full VGA engine chain (v5e).
        xw, xwb, q = jax.lax.fori_loop(0, num_iters, body,
                                       (xw0, xwb0, state.q),
                                       unroll=min(num_iters, 10))
        return GraphState(x=xw[:, 0], w=xw[:, 1:], q=q,
                          x_bar=xwb[:, 0], w_bar=xwb[:, 1:])

    def body(_, s: GraphState):
        # Dual ascent + projection onto the L-inf unit ball.
        Kx = _K_apply(top, s.x_bar, s.w_bar)
        q = jnp.clip(s.q + sigma * Kx, -1.0, 1.0)
        q = q * top.edge_valid[:, None]
        # Primal descent.
        gx, gw = _KT_apply(top, q, V)
        x_desc = s.x - tau_x * gx
        w_new = s.w - tau_w * gw
        # Prox of lambda|x - z| (soft shrinkage toward the measurement).
        r = x_desc - z
        thr = tau_x * lam
        x_new = z + jnp.sign(r) * jnp.maximum(jnp.abs(r) - thr, 0.0)
        # Frozen/invalid vertices keep their values.
        x_new = vmask * x_new + (1 - vmask) * s.x
        w_new = vmask[:, None] * w_new + (1 - vmask[:, None]) * s.w
        # Extra-gradient.
        x_bar = x_new + theta * (x_new - s.x)
        w_bar = w_new + theta * (w_new - s.w)
        return GraphState(x=x_new, w=w_new, q=q, x_bar=x_bar, w_bar=w_bar)

    return jax.lax.fori_loop(0, num_iters, body, state)


@jax.jit
def nltgv2_costs(state: GraphState, top: GraphTopology, z, lam, vtx_valid):
    """Smoothness/data costs for telemetry (reference FlameStats fields
    nltgv2_total/avg_smoothness_cost, nltgv2_total/avg_data_cost)."""
    K = _K_apply(top, state.x, state.w)
    smooth = jnp.sum(jnp.abs(K) * top.edge_valid[:, None])
    data = jnp.sum(jnp.abs(state.x - z) * lam * vtx_valid)
    n = jnp.maximum(jnp.sum(vtx_valid.astype(jnp.float32)), 1.0)
    return {
        "nltgv2_total_smoothness_cost": smooth,
        "nltgv2_avg_smoothness_cost": smooth / n,
        "nltgv2_total_data_cost": data,
        "nltgv2_avg_data_cost": data / n,
    }


def data_weights(var, valid, *, data_factor: float,
                 adaptive: bool, rescale: bool):
    """Per-vertex lambda_i (reference adaptive_data_weights / rescale_data
    semantics: adaptive -> weight by inverse posterior variance; rescale ->
    normalize weights to mean 1 over valid vertices)."""
    base = jnp.where(valid, 1.0, 0.0)
    if adaptive:
        base = jnp.where(valid, 1.0 / jnp.maximum(var, 1e-4), 0.0)
    if rescale:
        mean = jnp.sum(base) / jnp.maximum(
            jnp.sum(valid.astype(jnp.float32)), 1.0)
        base = base / jnp.maximum(mean, 1e-6)
    return data_factor * base


@partial(jax.jit, static_argnames=("max_degree",))
def graph_median(x, inc_edges, inc_sign, edges, vtx_valid,
                 *, max_degree: int = 16):
    """Median filter over graph neighborhoods (reference do_median_filter):
    x_i <- median(x_i, neighbors). Uses the incidence lists; the median of
    the padded neighborhood is computed by sorting with +/-inf padding
    split evenly so the median index stays centered."""
    V, D = inc_edges.shape
    other = jnp.where(inc_sign > 0, edges[inc_edges, 1],
                      edges[inc_edges, 0])
    vals = x[other]
    live = inc_sign != 0
    # Dead lanes pad with +inf; the (deg+1)-element neighborhood median is
    # then at sorted index deg//2 per vertex.
    vals = jnp.where(live, vals, jnp.inf)
    allv = jnp.concatenate([vals, x[:, None]], axis=1)
    s = jnp.sort(allv, axis=1)
    deg = jnp.sum(live.astype(jnp.int32), axis=1)
    med = jnp.take_along_axis(s, (deg // 2)[:, None], axis=1)[:, 0]
    return jnp.where(vtx_valid & (deg > 0), med, x)


@jax.jit
def graph_lowpass(x, edges, edge_valid, vtx_valid, alpha: float = 0.5):
    """Neighborhood lowpass over the graph (reference do_lowpass_filter):
    x_i <- (1-alpha) x_i + alpha * mean of valid neighbors."""
    V = x.shape[0]
    i, j = edges[:, 0], edges[:, 1]
    ew = edge_valid.astype(x.dtype)
    ssum = (jnp.zeros(V, x.dtype).at[i].add(ew * x[j]).at[j].add(ew * x[i]))
    scnt = (jnp.zeros(V, x.dtype).at[i].add(ew).at[j].add(ew))
    mean = ssum / jnp.maximum(scnt, 1.0)
    has_nb = scnt > 0
    out = jnp.where(vtx_valid & has_nb, (1 - alpha) * x + alpha * mean, x)
    return out

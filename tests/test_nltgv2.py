import numpy as np
import jax.numpy as jnp

from flame_ros_tpu.graph.delaunay import triangulate, edges_from_triangles
from flame_ros_tpu.ops.nltgv2 import (
    GraphState, build_topology, pd_iterate, nltgv2_costs, data_weights,
    graph_lowpass,
)


def _grid_graph(rng, nx=20, ny=15, spacing=16.0, jitter=4.0):
    xs, ys = np.meshgrid(np.arange(nx) * spacing, np.arange(ny) * spacing)
    pts = np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float32)
    pts += rng.uniform(-jitter, jitter, pts.shape).astype(np.float32)
    tris = triangulate(pts)
    edges = edges_from_triangles(tris)
    return pts, edges


def _pad_edges(edges, E):
    ev = np.zeros(E, bool)
    ev[:len(edges)] = True
    out = np.zeros((E, 2), np.int32)
    out[:len(edges)] = edges
    return jnp.asarray(out), jnp.asarray(ev)


def _energy(state, top, z, lam, valid):
    c = nltgv2_costs(state, top, z, lam, valid)
    return float(c["nltgv2_total_smoothness_cost"]
                 + c["nltgv2_total_data_cost"])


def test_planar_recovery_with_outliers(rng):
    """A 3D plane has affine inverse depth in pixel coords -> NLTGV2's null
    space. The L1 data term must reject sparse gross outliers."""
    pts, edges = _grid_graph(rng)
    V = len(pts)
    E = 2048
    e, ev = _pad_edges(edges, E)
    top = build_topology(e, ev, jnp.asarray(pts))

    a, b, c = 4e-4, -2e-4, 0.3
    z_true = (a * pts[:, 0] + b * pts[:, 1] + c).astype(np.float32)
    z = z_true + rng.normal(0, 0.002, V).astype(np.float32)
    out_idx = rng.choice(V, V // 20, replace=False)
    z[out_idx] += rng.choice([-0.3, 0.3], len(out_idx)).astype(np.float32)

    valid = jnp.ones(V, bool)
    lam = data_weights(jnp.full(V, 1e-3), valid, data_factor=0.15,
                       adaptive=False, rescale=False)
    state = GraphState(x=jnp.asarray(z), w=jnp.zeros((V, 2), jnp.float32),
                       q=jnp.zeros((E, 3), jnp.float32),
                       x_bar=jnp.asarray(z), w_bar=jnp.zeros((V, 2), jnp.float32))
    e0 = _energy(state, top, jnp.asarray(z), lam, valid)
    state = pd_iterate(state, top, jnp.asarray(z), lam, valid, num_iters=500)
    e1 = _energy(state, top, jnp.asarray(z), lam, valid)
    assert e1 < e0, f"energy did not decrease: {e0} -> {e1}"

    x = np.asarray(state.x)
    err = np.abs(x - z_true)
    # Outliers pulled to the plane.
    assert np.median(err[out_idx]) < 0.02, \
        f"outlier median err {np.median(err[out_idx])}"
    # Inliers stay accurate.
    inl = np.setdiff1d(np.arange(V), out_idx)
    assert np.sqrt((err[inl] ** 2).mean()) < 0.01
    # Plane gradients w approximate the true slope (scaled by pixels).
    w = np.asarray(state.w)
    assert abs(np.median(w[:, 0]) - a) < 2e-4
    assert abs(np.median(w[:, 1]) - b) < 2e-4


def test_frozen_vertices_unchanged(rng):
    pts, edges = _grid_graph(rng, nx=6, ny=5)
    V = len(pts)
    e, ev = _pad_edges(edges, 256)
    top = build_topology(e, ev, jnp.asarray(pts))
    z = rng.normal(0.4, 0.05, V).astype(np.float32)
    valid = np.ones(V, bool)
    valid[::3] = False
    x0 = jnp.asarray(z.copy())
    state = GraphState(x=x0, w=jnp.zeros((V, 2), jnp.float32),
                       q=jnp.zeros((256, 3), jnp.float32),
                       x_bar=x0, w_bar=jnp.zeros((V, 2), jnp.float32))
    lam = data_weights(jnp.full(V, 1e-3), jnp.asarray(valid),
                       data_factor=0.15, adaptive=False, rescale=False)
    out = pd_iterate(state, top, jnp.asarray(z), lam, jnp.asarray(valid),
                     num_iters=50)
    np.testing.assert_allclose(np.asarray(out.x)[~valid], z[~valid])


def test_padding_edges_are_noops(rng):
    """Identical result with and without extra padding rows."""
    pts, edges = _grid_graph(rng, nx=5, ny=4)
    V = len(pts)
    z = rng.normal(0.4, 0.05, V).astype(np.float32)
    valid = jnp.ones(V, bool)
    lam = data_weights(jnp.full(V, 1e-3), valid, data_factor=0.15,
                       adaptive=False, rescale=False)

    results = []
    for E in (len(edges), 4 * len(edges)):
        e, ev = _pad_edges(edges, E)
        top = build_topology(e, ev, jnp.asarray(pts))
        state = GraphState(x=jnp.asarray(z), w=jnp.zeros((V, 2), jnp.float32),
                           q=jnp.zeros((E, 3), jnp.float32),
                           x_bar=jnp.asarray(z),
                           w_bar=jnp.zeros((V, 2), jnp.float32))
        out = pd_iterate(state, top, jnp.asarray(z), lam, valid, num_iters=30)
        results.append(np.asarray(out.x))
    np.testing.assert_allclose(results[0], results[1], atol=1e-6)


def test_incidence_gather_matches_scatter(rng):
    """The gather-based K^T (incidence lists) must equal the scatter form."""
    from flame_ros_tpu.ops.nltgv2 import build_incidence
    pts, edges = _grid_graph(rng, nx=8, ny=6)
    V = len(pts)
    E = 256
    e, ev = _pad_edges(edges, E)
    inc_e, inc_s, keep = build_incidence(np.asarray(e), np.asarray(ev), V, 16)
    assert keep[:len(edges)].all()  # grid degree far below budget
    z = rng.normal(0.4, 0.05, V).astype(np.float32)
    valid = jnp.ones(V, bool)
    lam = data_weights(jnp.full(V, 1e-3), valid, data_factor=0.15,
                       adaptive=False, rescale=False)
    outs = []
    for use_inc in (False, True):
        top = build_topology(
            e, ev, jnp.asarray(pts),
            inc_edges=jnp.asarray(inc_e) if use_inc else None,
            inc_sign=jnp.asarray(inc_s) if use_inc else None)
        state = GraphState(x=jnp.asarray(z), w=jnp.zeros((V, 2), jnp.float32),
                           q=jnp.zeros((E, 3), jnp.float32),
                           x_bar=jnp.asarray(z),
                           w_bar=jnp.zeros((V, 2), jnp.float32))
        out = pd_iterate(state, top, jnp.asarray(z), lam, valid,
                         num_iters=40)
        outs.append((np.asarray(out.x), np.asarray(out.w)))
    np.testing.assert_allclose(outs[0][0], outs[1][0], atol=1e-5)
    np.testing.assert_allclose(outs[0][1], outs[1][1], atol=1e-5)


def test_matmul_adjoint_matches_gather(rng):
    """The MXU-adjoint sweep (gcat matmul, the TPU product path) must
    track the exact incidence-gather sweep to bf16 contribution rounding
    (~1e-3 absolute on the converged primal)."""
    from flame_ros_tpu.ops.nltgv2 import build_incidence, build_gcat
    pts, edges = _grid_graph(rng, nx=8, ny=6)
    V = len(pts)
    E = 256
    e, ev = _pad_edges(edges, E)
    inc_e, inc_s, keep = build_incidence(np.asarray(e), np.asarray(ev),
                                         V, 16)
    top = build_topology(e, ev, jnp.asarray(pts),
                         inc_edges=jnp.asarray(inc_e),
                         inc_sign=jnp.asarray(inc_s))
    z = rng.normal(0.4, 0.05, V).astype(np.float32)
    valid = jnp.ones(V, bool)
    lam = data_weights(jnp.full(V, 1e-3), valid, data_factor=0.15,
                       adaptive=False, rescale=False)
    state = GraphState(x=jnp.asarray(z), w=jnp.zeros((V, 2), jnp.float32),
                       q=jnp.zeros((E, 3), jnp.float32),
                       x_bar=jnp.asarray(z),
                       w_bar=jnp.zeros((V, 2), jnp.float32))
    ref = pd_iterate(state, top, jnp.asarray(z), lam, valid, num_iters=40)
    gcat = build_gcat(e, ev, V)
    mm = pd_iterate(state, top, jnp.asarray(z), lam, valid, gcat,
                    num_iters=40)
    np.testing.assert_allclose(np.asarray(mm.x), np.asarray(ref.x),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(mm.w), np.asarray(ref.w),
                               atol=2e-3)
    # gcat row/col structure: each valid edge contributes exactly one
    # tail and one head entry.
    g = np.asarray(gcat, np.float32)
    ne = int(np.asarray(ev).sum())
    assert g[:, :E].sum() == ne and g[:, E:].sum() == ne


def test_build_incidence_degree_cap(rng):
    """Edges beyond the degree budget are dropped consistently."""
    from flame_ros_tpu.ops.nltgv2 import build_incidence
    # Star graph: vertex 0 connected to 1..9, budget 4.
    edges = np.array([[0, k] for k in range(1, 10)], np.int32)
    ev = np.ones(9, bool)
    inc_e, inc_s, keep = build_incidence(edges, ev, 10, max_degree=4)
    assert keep.sum() == 4
    assert (inc_s[0] != 0).sum() == 4


def test_adaptive_rescaled_weights():
    var = jnp.asarray(np.array([1e-2, 1e-3, 1e-4], np.float32))
    valid = jnp.ones(3, bool)
    lam = data_weights(var, valid, data_factor=0.2, adaptive=True,
                       rescale=True)
    lam = np.asarray(lam)
    # Mean of (lam/data_factor) is 1 after rescale.
    np.testing.assert_allclose(lam.mean(), 0.2, rtol=1e-5)
    assert lam[2] > lam[1] > lam[0]


def test_graph_median(rng):
    """Median filter kills an isolated spike exactly (reference
    do_median_filter semantics)."""
    from flame_ros_tpu.ops.nltgv2 import build_incidence, graph_median
    pts, edges = _grid_graph(rng, nx=6, ny=5)
    V = len(pts)
    e, ev = _pad_edges(edges, 256)
    inc_e, inc_s, _ = build_incidence(np.asarray(e), np.asarray(ev), V, 16)
    x = np.full(V, 0.3, np.float32)
    x[12] = 5.0
    out = np.asarray(graph_median(
        jnp.asarray(x), jnp.asarray(inc_e), jnp.asarray(inc_s), e,
        jnp.ones(V, bool)))
    np.testing.assert_allclose(out[12], 0.3, atol=1e-6)
    # Non-spiked interior vertices unchanged.
    far = np.setdiff1d(np.arange(V), np.concatenate(
        [[12], edges[np.any(edges == 12, 1)].ravel()]))
    np.testing.assert_allclose(out[far], 0.3, atol=1e-6)


def test_graph_lowpass(rng):
    pts, edges = _grid_graph(rng, nx=6, ny=5)
    V = len(pts)
    e, ev = _pad_edges(edges, 256)
    x = np.full(V, 0.3, np.float32)
    x[7] = 1.0  # spike
    out = graph_lowpass(jnp.asarray(x), e, ev, jnp.ones(V, bool), alpha=0.5)
    out = np.asarray(out)
    assert out[7] < 0.7  # spike pulled toward neighbors
    far = np.setdiff1d(np.arange(V), np.concatenate(
        [[7], edges[np.any(edges == 7, 1)].ravel()]))
    np.testing.assert_allclose(out[far], 0.3, atol=1e-5)


def test_convergence_gated_sweeps(rng):
    """gate_tol > 0 (packed path): a tight tolerance reproduces the full
    fixed-sweep result; a practical tolerance reaches the same energy
    basin from a warm start — the steady-state case the gate exists for."""
    from flame_ros_tpu.ops.nltgv2 import build_incidence

    pts, edges = _grid_graph(rng)
    V = len(pts)
    E = 2048
    e, ev = _pad_edges(edges, E)
    inc_e, inc_s, keep = build_incidence(np.asarray(e), np.asarray(ev), V)
    ev = ev & jnp.asarray(keep)
    top = build_topology(e, ev, jnp.asarray(pts),
                         inc_edges=jnp.asarray(inc_e),
                         inc_sign=jnp.asarray(inc_s))
    z = rng.uniform(0.2, 1.5, V).astype(np.float32)
    lam = jnp.ones(V)
    valid = jnp.ones(V, bool)

    def fresh():
        return GraphState(x=jnp.asarray(z), w=jnp.zeros((V, 2)),
                          q=jnp.zeros((E, 3)), x_bar=jnp.asarray(z),
                          w_bar=jnp.zeros((V, 2)))

    full = pd_iterate(fresh(), top, z, lam, valid, num_iters=40)
    tight = pd_iterate(fresh(), top, z, lam, valid, num_iters=40,
                       gate_tol=1e-12)  # never triggers -> same sweeps
    np.testing.assert_allclose(np.asarray(tight.x), np.asarray(full.x),
                               atol=1e-6)

    # Warm start at the converged iterate: the gate must exit early and
    # stay at the fixed point (x unchanged beyond the tolerance scale).
    warm = pd_iterate(full, top, z, lam, valid, num_iters=40,
                      gate_tol=1e-4)
    assert float(jnp.abs(warm.x - full.x).max()) < 5e-3
    e_full = _energy(full, top, z, lam, valid)
    e_warm = _energy(warm, top, z, lam, valid)
    assert e_warm <= e_full * 1.01 + 1e-3

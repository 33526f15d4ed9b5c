import numpy as np
import jax.numpy as jnp

from flame_ros_tpu.graph.delaunay import triangulate
from flame_ros_tpu.ops.raster import rasterize_tri_ids
from flame_ros_tpu.ops.raster_pallas import rasterize_tri_ids_pallas


def _mesh(rng, n=120, H=96, W=128, T=256):
    pts = rng.uniform(4, [W - 4, H - 4], (n, 2)).astype(np.float32)
    tris = triangulate(pts)
    tris_pad = np.zeros((T, 3), np.int32)
    tris_pad[:len(tris)] = tris
    tv = np.zeros(T, bool)
    tv[:len(tris)] = True
    pos = np.zeros((256, 2), np.float32)
    pos[:n] = pts
    return jnp.asarray(pos), jnp.asarray(tris_pad), jnp.asarray(tv)


def test_pallas_matches_xla(rng):
    pos, tris, tv = _mesh(rng)
    ref = np.asarray(rasterize_tri_ids(pos, tris, tv, height=96, width=128))
    out = np.asarray(rasterize_tri_ids_pallas(
        pos, tris, tv, height=96, width=128, interpret=True))
    # Coverage identical; id choice identical (both pick the lowest id).
    np.testing.assert_array_equal(out, ref)
    assert (ref >= 0).mean() > 0.5


def test_pallas_matches_xla_ysorted(rng):
    """Engine-style y-sorted triangles exercise the contiguous-block-range
    culling path; coverage must be identical to the XLA formulation."""
    pos, tris, tv = _mesh(rng)
    tp = np.asarray(tris)
    tvn = np.asarray(tv)
    posn = np.asarray(pos)
    ymin = posn[tp, 1].min(axis=1)
    ymin[~tvn] = 1e9  # padding last
    order = np.argsort(ymin, kind="stable")
    tris_s = jnp.asarray(tp[order])
    tv_s = jnp.asarray(tvn[order])
    ref = np.asarray(rasterize_tri_ids(pos, tris_s, tv_s,
                                       height=96, width=128))
    out = np.asarray(rasterize_tri_ids_pallas(
        pos, tris_s, tv_s, height=96, width=128, interpret=True))
    np.testing.assert_array_equal(out, ref)
    assert (out >= 0).mean() > 0.5


def test_pallas_empty_mesh():
    pos = jnp.zeros((16, 2), jnp.float32)
    tris = jnp.zeros((32, 3), jnp.int32)
    tv = jnp.zeros(32, bool)
    out = np.asarray(rasterize_tri_ids_pallas(
        pos, tris, tv, height=32, width=128, interpret=True))
    assert (out == -1).all()


def test_pallas_v3_matches_xla(rng):
    """Class-split scalar-prefetch kernel: bit-identical to the XLA
    formulation, unsorted input (v3 sorts on device per call)."""
    from flame_ros_tpu.ops.raster_pallas import rasterize_tri_ids_pallas_v3
    pos, tris, tv = _mesh(rng)
    ref = np.asarray(rasterize_tri_ids(pos, tris, tv, height=96, width=128))
    out = np.asarray(rasterize_tri_ids_pallas_v3(
        pos, tris, tv, height=96, width=128, interpret=True))
    np.testing.assert_array_equal(out, ref)
    assert (ref >= 0).mean() > 0.5


def test_pallas_v3_long_triangles(rng):
    """Triangles taller than long_thresh route through the long class and
    must still rasterize exactly."""
    from flame_ros_tpu.ops.raster_pallas import rasterize_tri_ids_pallas_v3
    H, W, T = 96, 128, 256
    pts = rng.uniform(4, [W - 4, H - 4], (40, 2)).astype(np.float32)
    # Stretch some points to the image top/bottom -> very tall triangles.
    pts[:6, 1] = 2.0
    pts[6:12, 1] = H - 3.0
    tris = triangulate(pts)
    tris_pad = np.zeros((T, 3), np.int32)
    tris_pad[:len(tris)] = tris
    tv = np.zeros(T, bool)
    tv[:len(tris)] = True
    pos = np.zeros((256, 2), np.float32)
    pos[:len(pts)] = pts
    ref = np.asarray(rasterize_tri_ids(
        jnp.asarray(pos), jnp.asarray(tris_pad), jnp.asarray(tv),
        height=H, width=W))
    out = np.asarray(rasterize_tri_ids_pallas_v3(
        jnp.asarray(pos), jnp.asarray(tris_pad), jnp.asarray(tv),
        height=H, width=W, long_thresh=24.0, interpret=True))
    np.testing.assert_array_equal(out, ref)


def test_pallas_v3_budget_fallback(rng):
    """A frame whose per-tile block demand exceeds the static budget must
    fall back to the v2 kernel (exactness over speed)."""
    from flame_ros_tpu.ops.raster_pallas import rasterize_tri_ids_pallas_v3
    pos, tris, tv = _mesh(rng)
    ref = np.asarray(rasterize_tri_ids(pos, tris, tv, height=96, width=128))
    out = np.asarray(rasterize_tri_ids_pallas_v3(
        pos, tris, tv, height=96, width=128,
        s_blocks=1, l_blocks=1, tri_block=32, interpret=True))
    np.testing.assert_array_equal(out, ref)


def test_pallas_v4_matches_xla(rng):
    """Gather-compacted exact-candidate kernel: bit-identical to the XLA
    formulation, unsorted input (v4 sorts on device per call)."""
    from flame_ros_tpu.ops.raster_pallas import rasterize_tri_ids_pallas_v4
    pos, tris, tv = _mesh(rng)
    ref = np.asarray(rasterize_tri_ids(pos, tris, tv, height=96, width=128))
    out = np.asarray(rasterize_tri_ids_pallas_v4(
        pos, tris, tv, height=96, width=128, interpret=True))
    np.testing.assert_array_equal(out, ref)
    assert (ref >= 0).mean() > 0.5


def test_pallas_v4_long_triangles(rng):
    """Tall triangles route through the shared long slab; exact output."""
    from flame_ros_tpu.ops.raster_pallas import rasterize_tri_ids_pallas_v4
    H, W, T = 96, 128, 256
    pts = rng.uniform(4, [W - 4, H - 4], (40, 2)).astype(np.float32)
    pts[:6, 1] = 2.0
    pts[6:12, 1] = H - 3.0
    tris = triangulate(pts)
    tris_pad = np.zeros((T, 3), np.int32)
    tris_pad[:len(tris)] = tris
    tv = np.zeros(T, bool)
    tv[:len(tris)] = True
    pos = np.zeros((256, 2), np.float32)
    pos[:len(pts)] = pts
    ref = np.asarray(rasterize_tri_ids(
        jnp.asarray(pos), jnp.asarray(tris_pad), jnp.asarray(tv),
        height=H, width=W))
    out = np.asarray(rasterize_tri_ids_pallas_v4(
        jnp.asarray(pos), jnp.asarray(tris_pad), jnp.asarray(tv),
        height=H, width=W, long_thresh=24.0, interpret=True))
    np.testing.assert_array_equal(out, ref)


def test_pallas_v4_budget_fallback(rng):
    """Geometry exceeding the static candidate budgets falls back to v2
    (exactness over speed)."""
    from flame_ros_tpu.ops.raster_pallas import rasterize_tri_ids_pallas_v4
    pos, tris, tv = _mesh(rng)
    ref = np.asarray(rasterize_tri_ids(pos, tris, tv, height=96, width=128))
    out = np.asarray(rasterize_tri_ids_pallas_v4(
        pos, tris, tv, height=96, width=128, cand_s=128, cand_l=128,
        long_thresh=1000.0, interpret=True))
    np.testing.assert_array_equal(out, ref)

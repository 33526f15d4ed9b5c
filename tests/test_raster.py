import numpy as np
import jax.numpy as jnp

from flame_ros_tpu.geometry.camera import Pinhole
from flame_ros_tpu.graph.delaunay import triangulate
from flame_ros_tpu.ops.raster import (
    triangle_planes, rasterize_idepth, vertex_normals,
    mesh_display_filters, coverage)

CAM = Pinhole(fx=262.5, fy=262.5, cx=159.5, cy=119.5, width=320, height=240)


def _pad_tris(tris, T):
    out = np.zeros((T, 3), np.int32)
    out[:len(tris)] = tris
    tv = np.zeros(T, bool)
    tv[:len(tris)] = True
    return jnp.asarray(out), jnp.asarray(tv)


def test_rasterize_affine_exact(rng):
    """Rasterized map of a planar field reproduces the plane exactly."""
    pts = rng.uniform(10, 230, (80, 2)).astype(np.float32)
    pts[:, 0] *= 320 / 240.0
    tris_np = triangulate(pts)
    tris, tv = _pad_tris(tris_np, 256)
    a, b, c = 3e-4, -2e-4, 0.35
    x = (a * pts[:, 0] + b * pts[:, 1] + c).astype(np.float32)
    idepth, idmap = rasterize_idepth(
        jnp.asarray(pts), jnp.asarray(x), tris, tv, height=240, width=320)
    idepth = np.asarray(idepth)
    cov = np.isfinite(idepth)
    assert cov.mean() > 0.3
    yy, xx = np.mgrid[0:240, 0:320]
    expect = a * xx + b * yy + c
    err = np.abs(idepth - expect)[cov]
    assert err.max() < 1e-4, f"max raster err {err.max()}"


def test_rasterize_coverage_outside_hull_nan(rng):
    pts = np.array([[50, 50], [100, 50], [75, 100]], np.float32)
    tris, tv = _pad_tris(np.array([[0, 1, 2]]), 8)
    x = jnp.asarray(np.array([0.3, 0.3, 0.3], np.float32))
    idepth, idmap = rasterize_idepth(
        jnp.asarray(pts), x, tris, tv, height=240, width=320)
    idepth = np.asarray(idepth)
    assert np.isnan(idepth[0, 0])
    assert abs(idepth[60, 75] - 0.3) < 1e-5  # inside the triangle
    c = float(coverage(jnp.asarray(idepth)))
    inside_area = 0.5 * 50 * 50
    assert abs(c - inside_area / (240 * 320)) < 0.005


def test_triangle_planes_degenerate():
    pts = jnp.asarray(np.array([[0, 0], [1, 1], [2, 2], [5, 0]], np.float32))
    tris = jnp.asarray(np.array([[0, 1, 2], [0, 1, 3]], np.int32))
    x = jnp.asarray(np.array([1.0, 1, 1, 1], np.float32))
    g, ok = triangle_planes(pts, x, tris, jnp.ones(2, bool))
    assert not bool(ok[0])  # collinear
    assert bool(ok[1])


def test_vertex_normals_frontoparallel_and_plane():
    # Constant idepth (frontoparallel plane): normal is -z (toward camera).
    pos = jnp.asarray(np.array([[160.0, 120.0]], np.float32))
    n = vertex_normals(pos, jnp.asarray([0.5]), jnp.zeros((1, 2)), CAM)
    np.testing.assert_allclose(np.asarray(n)[0], [0, 0, -1], atol=1e-6)
    # Tilted plane z = z0 + k*X (normal has -x component for k>0):
    # idepth = 1/(z0 + kX), X = (u-cx)/fx / xi ... easier: verify the
    # normal is unit and tilts in the expected direction for w1 > 0.
    n2 = vertex_normals(pos, jnp.asarray([0.5]),
                        jnp.asarray(np.array([[1e-3, 0.0]], np.float32)), CAM)
    n2 = np.asarray(n2)[0]
    assert abs(np.linalg.norm(n2) - 1) < 1e-6
    assert abs(n2[0]) > 0.1 and abs(n2[1]) < 1e-6


def test_display_filters():
    pts = np.array([[50, 50], [80, 50], [65, 80],     # small near triangle
                    [150, 50], [310, 50], [230, 200]],  # huge triangle
                   np.float32)
    x = np.array([0.5, 0.5, 0.5, 0.5, 0.5, 0.5], np.float32)
    tris = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    tv = jnp.ones(2, bool)
    keep = mesh_display_filters(
        jnp.asarray(pts), jnp.asarray(x), jnp.zeros((6, 2)),
        jnp.asarray(tris), tv, CAM,
        edge_length_thresh=0.333)
    assert bool(keep[0])
    assert not bool(keep[1])  # long edges (160px > 0.333*320)

    # Oblique: large idepth spread across a triangle.
    x2 = np.array([0.5, 0.1, 0.5, 0.5, 0.5, 0.5], np.float32)
    keep2 = mesh_display_filters(
        jnp.asarray(pts), jnp.asarray(x2), jnp.zeros((6, 2)),
        jnp.asarray(tris), tv, CAM, filter_long_edges=False)
    assert not bool(keep2[0])

    # Min idepth: far triangle culled.
    x3 = np.array([0.005, 0.005, 0.005, 0.5, 0.5, 0.5], np.float32)
    keep3 = mesh_display_filters(
        jnp.asarray(pts), jnp.asarray(x3), jnp.zeros((6, 2)),
        jnp.asarray(tris), tv, CAM, filter_long_edges=False,
        filter_oblique=False)
    assert not bool(keep3[0])

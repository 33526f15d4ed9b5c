import numpy as np
import pytest

from flame_ros_tpu.graph.delaunay import (
    triangulate, edges_from_triangles, native_available)


def _is_delaunay(pts, tris, tol=1e-7):
    """Check empty-circumcircle property for every triangle vs every point."""
    a, b, c = pts[tris[:, 0]], pts[tris[:, 1]], pts[tris[:, 2]]
    # Circumcenters via perpendicular bisector solve.
    d = 2 * (a[:, 0] * (b[:, 1] - c[:, 1]) + b[:, 0] * (c[:, 1] - a[:, 1])
             + c[:, 0] * (a[:, 1] - b[:, 1]))
    ux = ((a**2).sum(1) * (b[:, 1] - c[:, 1]) + (b**2).sum(1) * (c[:, 1] - a[:, 1])
          + (c**2).sum(1) * (a[:, 1] - b[:, 1])) / d
    uy = ((a**2).sum(1) * (c[:, 0] - b[:, 0]) + (b**2).sum(1) * (a[:, 0] - c[:, 0])
          + (c**2).sum(1) * (b[:, 0] - a[:, 0])) / d
    r2 = (a[:, 0] - ux) ** 2 + (a[:, 1] - uy) ** 2
    for t in range(len(tris)):
        d2 = (pts[:, 0] - ux[t]) ** 2 + (pts[:, 1] - uy[t]) ** 2
        inside = d2 < r2[t] - tol * max(r2[t], 1.0)
        inside[tris[t]] = False
        if inside.any():
            return False
    return True


def _euler_ok(n_pts, tris):
    """Planar triangulation of a convex region: T = 2n - 2 - h, E = 3n-3-h
    where h = hull vertices. Verify Euler's formula V - E + F = 2."""
    edges = edges_from_triangles(tris)
    V, E, F = n_pts, len(edges), len(tris) + 1  # +1 outer face
    return V - E + F == 2


def test_native_builds():
    assert native_available(), "native delaunay failed to build/load"


@pytest.mark.parametrize("n", [3, 4, 10, 100, 500])
def test_random_points_native(rng, n):
    pts = rng.uniform(0, 640, (n, 2))
    tris = triangulate(pts)
    assert len(tris) > 0
    # CCW orientation.
    a, b, c = pts[tris[:, 0]], pts[tris[:, 1]], pts[tris[:, 2]]
    cross = ((b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1])
             - (b[:, 1] - a[:, 1]) * (c[:, 0] - a[:, 0]))
    assert (cross > 0).all()
    assert _euler_ok(n, tris)
    assert _is_delaunay(pts, tris)


def test_matches_scipy_triangle_count(rng):
    pts = rng.uniform(0, 100, (200, 2))
    t_native = triangulate(pts)
    t_scipy = triangulate(pts, force_scipy=True)
    # Same jitter -> identical triangulation up to ordering.
    s1 = {tuple(sorted(t)) for t in t_native}
    s2 = {tuple(sorted(t)) for t in t_scipy}
    assert s1 == s2


def test_grid_points(rng):
    """Integer grid: maximally cocircular; jitter must keep it consistent."""
    xs, ys = np.meshgrid(np.arange(12) * 16.0, np.arange(10) * 16.0)
    pts = np.stack([xs.ravel(), ys.ravel()], -1)
    tris = triangulate(pts)
    assert _euler_ok(len(pts), tris)
    # T = 2n - 2 - h: between the unjittered-grid hull (h = 40) and the
    # minimal 4-corner hull (jitter pulls perimeter points off the hull).
    assert 2 * 11 * 9 <= len(tris) <= 2 * 120 - 2 - 4


def test_degenerate_inputs():
    assert triangulate(np.zeros((0, 2))).shape == (0, 3)
    assert triangulate(np.array([[0.0, 0], [1, 1]])).shape == (0, 3)
    # collinear
    pts = np.stack([np.arange(5.0), np.arange(5.0)], -1)
    assert len(triangulate(pts)) == 0


def test_edges_from_triangles():
    tris = np.array([[0, 1, 2], [1, 3, 2]], np.int32)
    e = edges_from_triangles(tris)
    assert e.shape == (5, 2)
    assert {tuple(x) for x in e} == {(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)}


def test_realistic_feature_cloud(rng):
    """Feature-like input: ~1200 detections on a jittered grid."""
    xs, ys = np.meshgrid(np.arange(40) * 16.0 + 8, np.arange(30) * 16.0 + 8)
    pts = np.stack([xs.ravel(), ys.ravel()], -1) + rng.uniform(-6, 6, (1200, 2))
    tris = triangulate(pts)
    assert _euler_ok(len(pts), tris)
    assert _is_delaunay(pts, tris)

import numpy as np

from flame_ros_tpu.viz.export import (
    backproject_mesh, write_ply_mesh, depthmap_to_cloud, write_ply_cloud)
from flame_ros_tpu.viz.html_viewer import export_html_viewer

K = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])


def _mesh():
    uv = np.array([[32.0, 24.0], [42.0, 24.0], [32.0, 34.0]], np.float32)
    xi = np.array([0.5, 0.5, 0.5], np.float32)
    normals = np.tile(np.array([0, 0, -1.0], np.float32), (3, 1))
    tris = np.array([[0, 1, 2]], np.int32)
    return uv, xi, normals, tris


def test_backproject_matches_reference_formula():
    uv, xi, _, _ = _mesh()
    xyz, tex = backproject_mesh(uv, xi, K)
    # Principal point at idepth 0.5 -> (0, 0, 2).
    np.testing.assert_allclose(xyz[0], [0, 0, 2], atol=1e-6)
    # 10 px right of principal point: x = 10/100 / 0.5 = 0.2.
    np.testing.assert_allclose(xyz[1], [0.2, 0, 2], atol=1e-6)
    assert tex.shape == (3, 2)


def test_write_ply_mesh(tmp_path):
    uv, xi, normals, tris = _mesh()
    gray = np.full((48, 64), 128.0, np.float32)
    p = tmp_path / "mesh.ply"
    write_ply_mesh(str(p), uv, xi, normals, tris, [True], K, rgb=gray)
    blob = p.read_bytes()
    assert blob.startswith(b"ply")
    assert b"element vertex 3" in blob
    assert b"element face 1" in blob
    assert b"property uchar red" in blob


def test_depthmap_to_cloud_and_ply(tmp_path):
    m = np.full((48, 64), np.nan, np.float32)
    m[24, 32] = 0.5
    m[10, 10] = 2.0   # depth 0.5 -> filtered by min_depth=1
    pts = depthmap_to_cloud(m, K, min_depth=1.0)
    assert pts.shape == (1, 3)
    np.testing.assert_allclose(pts[0], [0, 0, 2], atol=1e-6)
    p = tmp_path / "cloud.ply"
    write_ply_cloud(str(p), pts)
    assert p.read_bytes().startswith(b"ply")


def test_html_viewer_export(tmp_path):
    uv, xi, normals, tris = _mesh()
    gray = np.random.default_rng(0).uniform(0, 255, (48, 64))
    p = tmp_path / "viewer.html"
    export_html_viewer(str(p), uv, xi, normals, tris, [True], K, gray=gray)
    html = p.read_text()
    assert "<canvas" in html
    assert '"tris": [0, 1, 2]' in html
    assert "texture_png" in html and "data:image/png" in html
    # All four reference shader modes present.
    for mode in ("jet", "idepth", "normal", "texture"):
        assert f">{mode}</button>" in html

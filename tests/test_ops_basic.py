import numpy as np
import jax.numpy as jnp

from flame_ros_tpu.ops.interp import bilinear, nearest
from flame_ros_tpu.ops.gradients import central_gradients, gradient_magnitude
from flame_ros_tpu.ops.detection import (
    detect_features, occupancy_from_features, cell_grid_shape)
from flame_ros_tpu.datasets.synthetic import make_sequence, render_frame, QVGA


def test_bilinear_exact_on_grid(rng):
    img = jnp.asarray(rng.normal(size=(16, 20)).astype(np.float32))
    uv = jnp.array([[3.0, 5.0], [0.0, 0.0], [19.0, 15.0]])
    vals, valid = bilinear(img, uv)
    np.testing.assert_allclose(
        vals, [img[5, 3], img[0, 0], img[15, 19]], atol=1e-4)
    assert bool(valid.all())


def test_bilinear_interpolates_linear_ramp():
    # On a linear ramp, bilinear sampling is exact everywhere.
    H, W = 12, 18
    y, x = np.mgrid[0:H, 0:W]
    img = jnp.asarray((2.0 * x + 3.0 * y).astype(np.float32))
    uv = jnp.array([[4.25, 7.5], [10.9, 3.1]])
    vals, _ = bilinear(img, uv)
    np.testing.assert_allclose(
        vals, [2 * 4.25 + 3 * 7.5, 2 * 10.9 + 3 * 3.1], rtol=1e-5)


def test_bilinear_out_of_bounds():
    img = jnp.ones((8, 8))
    vals, valid = bilinear(img, jnp.array([[-1.0, 2.0], [2.0, 9.0]]),
                           out_of_bounds=-7.0)
    assert not bool(valid.any())
    np.testing.assert_allclose(vals, [-7.0, -7.0])


def test_nearest():
    img = jnp.arange(12.0).reshape(3, 4)
    vals, valid = nearest(img, jnp.array([[1.4, 0.6], [3.6, 2.2]]))
    # (1.4, 0.6) rounds to col 1, row 1. (3.6, 2.2) rounds to col 4 -> OOB.
    np.testing.assert_allclose(vals[0], img[1, 1])
    assert bool(valid[0])
    assert not bool(valid[1])
    np.testing.assert_allclose(vals[1], 0.0)


def test_gradients_on_ramp():
    H, W = 10, 14
    y, x = np.mgrid[0:H, 0:W]
    img = jnp.asarray((5.0 * x - 2.0 * y).astype(np.float32))
    gx, gy = central_gradients(img)
    np.testing.assert_allclose(gx, np.full((H, W), 5.0), atol=1e-5)
    np.testing.assert_allclose(gy, np.full((H, W), -2.0), atol=1e-5)
    np.testing.assert_allclose(gradient_magnitude(img),
                               np.full((H, W), np.hypot(5, 2)), atol=1e-4)


def test_detect_features_finds_corners():
    # Image of zeros with a few bright blobs: detections land on blob edges.
    H, W, win = 64, 96, 16
    img = np.zeros((H, W), np.float32)
    img[20:24, 30:34] = 200.0
    img[40:44, 70:74] = 200.0
    occ = jnp.zeros(cell_grid_shape(H, W, win), bool)
    uv, score, valid = detect_features(jnp.asarray(img), occ,
                                       win_size=win, min_grad_mag=5.0)
    assert uv.shape == (24, 2)
    got = np.asarray(uv[np.asarray(valid)])
    assert len(got) >= 2
    # Every valid detection is near a blob.
    for u, v in got:
        near1 = abs(u - 31.5) < 6 and abs(v - 21.5) < 6
        near2 = abs(u - 71.5) < 6 and abs(v - 41.5) < 6
        assert near1 or near2


def test_detect_respects_occupancy():
    H, W, win = 64, 64, 16
    img = np.zeros((H, W), np.float32)
    img[18:22, 18:22] = 200.0
    occ = np.zeros(cell_grid_shape(H, W, win), bool)
    uv, score, valid = detect_features(jnp.asarray(img), jnp.asarray(occ),
                                       win_size=win, min_grad_mag=5.0)
    n_before = int(np.asarray(valid).sum())
    assert n_before > 0
    occ[:, :] = True
    _, _, valid2 = detect_features(jnp.asarray(img), jnp.asarray(occ),
                                   win_size=win, min_grad_mag=5.0)
    assert int(np.asarray(valid2).sum()) == 0


def test_occupancy_from_features():
    occ = occupancy_from_features(
        jnp.array([[5.0, 5.0], [40.0, 20.0], [100.0, 100.0]]),
        jnp.array([True, True, False]), height=64, width=64, win_size=16)
    occ = np.asarray(occ)
    assert occ[0, 0] and occ[1, 2]
    assert occ.sum() == 2  # invalid feature and OOB clamp don't add extras


def test_synthetic_sequence():
    seq = make_sequence(n_frames=3, cam=QVGA)
    assert seq.images.shape == (3, 240, 320)
    assert seq.depths.shape == (3, 240, 320)
    # Depth must be positive nearly everywhere (closed room).
    assert (seq.depths[0] > 0).mean() > 0.99
    assert seq.depths[0].max() < 10.0
    # Texture has usable gradients in most detection cells.
    from flame_ros_tpu.ops.detection import detect_features as det
    occ = jnp.zeros(cell_grid_shape(240, 320, 16), bool)
    _, _, valid = det(jnp.asarray(seq.images[0]), occ, win_size=16,
                      min_grad_mag=5.0)
    assert np.asarray(valid).mean() > 0.7


def test_render_depth_consistent_with_pose():
    # Moving the camera +z by 0.5 should reduce center depth by ~0.5.
    from flame_ros_tpu.geometry.se3 import SE3
    import jax.numpy as jnp
    g0, d0 = render_frame(QVGA, jnp.array([1.0, 0, 0, 0]), jnp.zeros(3))
    g1, d1 = render_frame(QVGA, jnp.array([1.0, 0, 0, 0]),
                          jnp.array([0.0, 0.0, 0.5]))
    c = np.asarray(d0)[120, 160] - np.asarray(d1)[120, 160]
    np.testing.assert_allclose(c, 0.5, atol=1e-3)

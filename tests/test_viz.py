import numpy as np
import jax.numpy as jnp

from flame_ros_tpu.ops.colormap import jet, jet_u8, apply_colormap_over
from flame_ros_tpu.viz import debug_images as dbg


def test_jet_endpoints():
    lo = np.asarray(jet(jnp.asarray(0.0)))
    hi = np.asarray(jet(jnp.asarray(1.0)))
    mid = np.asarray(jet(jnp.asarray(0.5)))
    # Classic jet: dark blue at 0, dark red at 1, green mid.
    assert lo[2] >= 0.5 and lo[0] == 0
    assert hi[0] >= 0.5 and hi[2] == 0
    assert mid[1] > 0.9
    u8 = jet_u8(np.array([0.0, 1.0]))
    assert u8.dtype == np.uint8 and u8.shape == (2, 3)


def test_apply_colormap_over_keeps_nan_pixels():
    base = np.zeros((4, 4, 3), np.uint8)
    vals = np.full((4, 4), np.nan)
    vals[1, 1] = 0.5
    out = apply_colormap_over(base, vals, 0, 1)
    assert (out[0, 0] == 0).all()
    assert out[1, 1].sum() > 0


def _gray():
    return np.full((48, 64), 90.0, np.float32)


def test_draw_wireframe_and_features():
    uv = np.array([[10, 10], [40, 12], [20, 40]], np.float32)
    x = np.array([0.3, 0.5, 0.7], np.float32)
    img = dbg.draw_wireframe(_gray(), uv, x, np.array([[0, 1, 2]]),
                             [True], text="test")
    assert img.shape == (48, 64, 3) and img.dtype == np.uint8
    assert (img != img[0, 0]).any()  # something was drawn
    img2 = dbg.draw_features(_gray(), uv, x, [True, True, False])
    assert (img2 != np.stack([_gray().astype(np.uint8)] * 3, -1)).any()


def test_draw_matches_colors():
    from flame_ros_tpu.ops.epipolar import STATUS_OK, STATUS_MAX_COST
    uv0 = np.array([[5, 5], [30, 30]], np.float32)
    uv1 = np.array([[15, 5], [40, 30]], np.float32)
    img = dbg.draw_matches(_gray(), uv0, uv1,
                           np.array([STATUS_OK, STATUS_MAX_COST]),
                           [True, True])
    # Green somewhere on row 5, red somewhere on row 30.
    assert (img[5, :, 1] > 200).any()
    assert (img[30, :, 0] > 200).any()


def test_draw_idepthmap_flip():
    m = np.full((48, 64), np.nan, np.float32)
    m[:24] = 0.5
    img = dbg.draw_idepthmap(_gray(), m)
    img_f = dbg.draw_idepthmap(_gray(), m, flip=True)
    np.testing.assert_array_equal(img_f, img[::-1, ::-1])


def test_render_debug_images_from_engine():
    from flame_ros_tpu.config import FlameParams
    from flame_ros_tpu.datasets.synthetic import make_sequence, QVGA
    from flame_ros_tpu.geometry.se3 import SE3
    from flame_ros_tpu.models.engine import Flame
    seq = make_sequence(n_frames=7, cam=QVGA)
    params = FlameParams.from_dict({
        "engine": {"max_features": 256, "max_keyframes": 2,
                   "pd_iters_per_frame": 5},
        "debug": {"wireframe": True, "features": True, "idepthmap": True,
                  "matches": True, "detections": True, "normals": True},
    })
    eng = Flame(QVGA.width, QVGA.height, cam=QVGA, params=params)
    for i in range(7):
        eng.update(seq.timestamps[i], i, SE3(seq.poses.q[i], seq.poses.t[i]),
                   seq.images[i], is_poseframe=(i % 6 == 0))
    eng.flush_stats()
    out = dbg.render_debug_images(eng, seq.images[6])
    assert set(out.keys()) == {"wireframe", "features", "idepthmap",
                               "matches", "detections", "normals"}
    for im in out.values():
        assert im.shape == (240, 320, 3)
    # Normal map itself: unit vectors where defined.
    nm = eng.get_normal_map()
    ok = np.isfinite(nm).all(-1)
    assert ok.mean() > 0.3
    np.testing.assert_allclose(
        np.linalg.norm(nm[ok], axis=-1), 1.0, atol=1e-4)

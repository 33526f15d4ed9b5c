"""Multi-chip sharding tests on the simulated 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flame_ros_tpu.parallel import multi_stream as ms


def test_make_mesh_shapes():
    mesh = ms.make_mesh(jax.devices())
    assert mesh.shape["stream"] * mesh.shape["feat"] == 8


def test_dryrun_entrypoint():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_batched_step_matches_single():
    """The sharded multi-stream step must produce the same result as the
    unsharded single-stream step."""
    import __graft_entry__ as g
    params, cam, state, pyr, q, t = g._tiny_setup()

    # Single-stream reference.
    fn, args = g.entry()
    state1, idepth1, cov1 = jax.jit(fn)(*args)

    # Two-stream batched on a mesh.
    mesh = ms.make_mesh(jax.devices()[:4], stream_axis=2)
    batched = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (2,) + x.shape), state)
    shardings = ms.state_shardings(mesh)
    batched = jax.tree.map(jax.device_put, batched, shardings)
    img_pyrs = jnp.broadcast_to(pyr[None], (2,) + pyr.shape)
    with mesh:
        out_state, idepth2, cov2 = ms.batched_frame_step(
            batched, img_pyrs,
            jnp.broadcast_to(q[None], (2, 4)),
            jnp.broadcast_to(t[None], (2, 3)),
            jnp.ones((2,), jnp.int32), cam=cam, params=params)
    np.testing.assert_allclose(np.asarray(cov2), float(cov1), atol=1e-5)
    a = np.asarray(idepth1)
    b = np.asarray(idepth2)[0]
    mask = np.isfinite(a) & np.isfinite(b)
    assert (np.isfinite(a) == np.isfinite(b)).mean() > 0.999
    np.testing.assert_allclose(a[mask], b[mask], atol=1e-4)

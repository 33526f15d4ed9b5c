"""Guard: geometry-critical f32 contractions carry HIGHEST precision.

On TPU, a float32 ``dot_general`` at DEFAULT precision truncates its
operands to bfloat16 before the MXU. Measured on the VGA/120 rotation
acceptance protocol (identical code + inputs): idepth rmse 0.029 CPU,
0.100 TPU at DEFAULT, 0.028 TPU at HIGHEST — the whole chip-accuracy
delta was matmul input truncation (BENCH_NOTES §round-4 TPU numerics;
fix: utils/precision.py helpers at every geometry contraction).

This test walks the jaxprs of the product step and the estimator
solves and asserts no float32xfloat32 dot_general is left at DEFAULT
precision. Deliberate-bf16 dots (ops/nltgv2.py dual reduction,
ops/detection.py cell counts) pass because at least one operand is
bfloat16 — truncation there is explicit, backend-uniform design.
Reintroducing a bare ``@`` / ``jnp.dot`` / ``jnp.einsum`` on the f32
compute path fails here, not silently on the chip.
"""
import jax
import jax.numpy as jnp
import numpy as np

_HI = (jax.lax.Precision.HIGHEST, jax.lax.Precision.HIGHEST)


def _walk(jaxpr, out):
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "dot_general":
            dtypes = {v.aval.dtype for v in eqn.invars
                      if hasattr(v.aval, "dtype")}
            prec = eqn.params.get("precision")
            if (jnp.bfloat16 not in dtypes
                    and any(d == jnp.float32 for d in dtypes)
                    and prec != _HI):
                out.append((eqn, prec))
        # Recurse through call/loop/branch sub-jaxprs.
        for v in eqn.params.values():
            vals = v if isinstance(v, (list, tuple)) else [v]
            for item in vals:
                inner = getattr(item, "jaxpr", item)
                if hasattr(inner, "eqns"):
                    _walk(inner, out)
    return out


def _assert_no_default_f32_dots(fn, *args):
    jaxpr = jax.make_jaxpr(fn)(*args)
    bad = _walk(jaxpr.jaxpr, [])
    # jnp.linalg.solve lowers through lu/triangular_solve whose internal
    # dots we do not author (tiny, Jacobi-normalized systems); everything
    # written in this repo must be HIGHEST. Exempt ONLY frames from the
    # jax/scipy linalg modules themselves — a bare "linalg" substring
    # would also exempt repo-authored dots in any path containing it
    # (ADVICE r4).
    def _is_library_linalg(e):
        tb = str(e.source_info.traceback)
        return ("jax/_src/numpy/linalg" in tb
                or "jax\\_src\\numpy\\linalg" in tb
                or "jax/_src/scipy/linalg" in tb
                or "jax/_src/lax/linalg" in tb
                or "scipy/linalg" in tb)

    bad = [(e, p) for (e, p) in bad if not _is_library_linalg(e)]
    assert not bad, (
        f"{len(bad)} float32 dot_general(s) at non-HIGHEST precision "
        f"(TPU would truncate the operands to bf16): "
        + "; ".join(
            f"{p} @ {e.source_info.traceback}" for e, p in bad[:3]))


def test_product_step_dots_are_exact():
    """The flagship single-chip forward step (driver entry) — covers the
    engine dispatch: detection slot-assign, epipolar search, NLTGV2
    sweep, raster."""
    import __graft_entry__ as ge

    fn, example_args = ge.entry()
    _assert_no_default_f32_dots(fn, *example_args)


def test_tracking_solve_dots_are_exact():
    from functools import partial

    from flame_ros_tpu.geometry.camera import Pinhole
    from flame_ros_tpu.models.tracking import track_frame
    from flame_ros_tpu.ops.pyramid import build_pyramid

    cam = Pinhole(fx=100.0, fy=100.0, cx=63.5, cy=47.5,
                  width=128, height=96)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (96, 128)).astype(np.float32))
    pyr = build_pyramid(img, 3)
    idepth = jnp.full((96, 128), 0.5, jnp.float32)
    q = jnp.array([0.0, 0.0, 0.0, 1.0])
    t = jnp.zeros(3)
    _assert_no_default_f32_dots(
        partial(track_frame, cam=cam, num_points=256), pyr, idepth,
        pyr, q, t)


def test_pose_graph_solve_dots_are_exact():
    from flame_ros_tpu.geometry.se3 import SE3
    from flame_ros_tpu.models.pose_graph import (make_graph,
                                                 optimize_pose_graph)

    K = 4
    poses = SE3.identity((K,))
    edges = np.array([[i, i + 1] for i in range(K - 1)], np.int32)
    meas = SE3.identity((K - 1,))
    g = make_graph(poses, edges, meas)
    _assert_no_default_f32_dots(
        lambda gg: optimize_pose_graph(gg, num_iters=2), g)


def test_ba_solve_dots_are_exact():
    from functools import partial

    from flame_ros_tpu.geometry.camera import Pinhole
    from flame_ros_tpu.models.ba import bundle_adjust_window
    from flame_ros_tpu.ops.pyramid import build_pyramid

    cam = Pinhole(fx=100.0, fy=100.0, cx=63.5, cy=47.5,
                  width=128, height=96)
    rng = np.random.default_rng(0)
    K, P = 2, 64
    pyrs = jnp.stack([
        build_pyramid(
            jnp.asarray(rng.uniform(0, 255, (96, 128)).astype(np.float32)),
            3)
        for _ in range(K)])
    uv = jnp.asarray(rng.uniform(8, [120, 88], (P, 2)).astype(np.float32))
    idepth = jnp.full((P,), 0.5, jnp.float32)
    q = jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0]), (K, 1))
    t = jnp.zeros((K, 3))
    point_valid = jnp.ones((P,), bool)
    kf_valid = jnp.ones((K,), bool)
    _assert_no_default_f32_dots(
        partial(bundle_adjust_window, cam=cam, num_iters=2,
                coarse_iters=2),
        pyrs, q, t, kf_valid, uv, idepth, point_valid)

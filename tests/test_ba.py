import numpy as np
import jax.numpy as jnp
import pytest

from flame_ros_tpu.datasets.synthetic import make_sequence, QVGA
from flame_ros_tpu.geometry.se3 import SE3
from flame_ros_tpu.models.ba import bundle_adjust_window
from flame_ros_tpu.ops.detection import detect_features, cell_grid_shape
from flame_ros_tpu.ops.pyramid import build_pyramid


@pytest.fixture(scope="module")
def setup():
    seq = make_sequence(n_frames=30, cam=QVGA, motion="strafe")
    kf_ids = [0, 2, 4, 6]
    K = len(kf_ids)
    pyrs = jnp.stack([build_pyramid(jnp.asarray(seq.images[i]), 3)
                      for i in kf_ids])
    q = jnp.stack([seq.poses.q[i] for i in kf_ids])
    t = jnp.stack([seq.poses.t[i] for i in kf_ids])
    occ = jnp.zeros(cell_grid_shape(240, 320, 16), bool)
    duv, _, dvalid = detect_features(jnp.asarray(seq.images[0]), occ,
                                     win_size=16, min_grad_mag=8.0)
    uv = np.asarray(duv)[np.asarray(dvalid)][:256]
    P = 256
    uvp = np.zeros((P, 2), np.float32)
    uvp[:len(uv)] = uv
    pv = np.arange(P) < len(uv)
    d = seq.depths[0]
    gt_idepth = 1.0 / np.maximum(
        d[np.clip(uvp[:, 1].astype(int), 0, 239),
          np.clip(uvp[:, 0].astype(int), 0, 319)], 1e-6)
    return seq, pyrs, q, t, jnp.asarray(uvp), gt_idepth, jnp.asarray(pv), K


def _pose_errs(q, t, true_q, true_t, K):
    errs = []
    for k in range(K):
        dd = SE3(q[k], t[k]).inverse() @ SE3(true_q[k], true_t[k])
        errs.append(np.linalg.norm(np.asarray(dd.log())))
    return np.asarray(errs)


def test_ba_refines_perturbed_poses(setup):
    """Perturb the pose of the keyframe adjacent to the reference; BA with
    near-GT depths must pull it back toward GT ON AVERAGE across noise
    draws (the photometric optimum sits ~5-10 mm from GT at level 1, and
    individual draws vary; a single-draw threshold is seed luck). Far
    keyframes at 0.3-0.5 m baselines have a narrower photometric basin —
    their recovery envelope is a round-2 item tracked in BENCH_NOTES; the
    cost-vs-GT-config check covers the joint objective per draw."""
    seq, pyrs, q, t, uvp, gt_idepth, pv, K = setup
    r_gt = bundle_adjust_window(
        pyrs, q, t, jnp.ones(K, bool), uvp,
        jnp.asarray(gt_idepth.astype(np.float32)), pv,
        cam=seq.cam, num_iters=0, coarse_iters=0, level=1)
    ratios, afters = [], []
    for seed in (0, 7, 13):
        rng = np.random.default_rng(seed)
        noise = np.zeros((K, 6), np.float32)
        noise[1] = rng.normal(0, 0.02, 6)  # ~2 cm / 1.1 deg on frame 1
        Tn = [SE3(q[k], t[k]) @ SE3.exp(jnp.asarray(noise[k]))
              for k in range(K)]
        qn = jnp.stack([p.q for p in Tn])
        tn = jnp.stack([p.t for p in Tn])
        before = _pose_errs(qn, tn, q, t, K)
        res = bundle_adjust_window(
            pyrs, qn, tn, jnp.ones(K, bool), uvp,
            jnp.asarray(gt_idepth.astype(np.float32)), pv,
            cam=seq.cam, num_iters=12, level=1)
        after = _pose_errs(res.q, res.t, q, t, K)
        ratios.append(after[1] / max(before[1], 1e-9))
        afters.append(after)
        # Per-draw invariants: the intensity cost stays in the GT
        # configuration's regime (the optimizer balances intensity +
        # gradient channels, so its optimum need not minimize the
        # intensity-only metric; 1.5x guards divergence, the
        # distributional asserts below carry the quality bar), no frame
        # diverges, and the gauge (reference keyframe) is untouched.
        assert float(res.final_cost) <= 1.5 * float(r_gt.final_cost), \
            f"seed {seed}: cost {float(res.final_cost)} vs GT " \
            f"{float(r_gt.final_cost)}"
        # Bounded, not diverging: large draws (seed 13's is ~0.08 rad+m
        # on a 0.3 m baseline) may not recover at level 1, but must not
        # run away (raw BA pre-gradient-channel hit 1.37x the input
        # error on such draws).
        assert after.max() < 1.25 * max(before.max(), 0.05), \
            f"seed {seed}: before {before} after {after}"
        np.testing.assert_allclose(np.asarray(res.t[0]), np.asarray(t[0]),
                                   atol=1e-7)
    assert np.mean(ratios) < 0.85, f"recovery ratios {ratios}"
    assert np.mean([a.sum() for a in afters]) < 0.10, afters


def test_ba_refines_noisy_depths(setup, rng):
    """True poses + noisy depths: the Schur back-substitution must improve
    the depth estimates."""
    seq, pyrs, q, t, uvp, gt_idepth, pv, K = setup
    d0 = gt_idepth * (1.0 + rng.normal(0, 0.08, len(gt_idepth)))
    res = bundle_adjust_window(
        pyrs, q, t, jnp.ones(K, bool), uvp,
        jnp.asarray(d0.astype(np.float32)), pv,
        cam=seq.cam, num_iters=12, level=0, depth_prior_weight=1e-2,
        optimize_poses=False)
    m = np.asarray(pv)
    err0 = np.abs(d0 - gt_idepth)[m]
    err1 = np.abs(np.asarray(res.idepths) - gt_idepth)[m]
    # The solver converges to the PHOTOMETRIC depth optimum; detections
    # sit on gradients where nearest-pixel GT is ambiguous, so ~10-15%
    # median improvement against that GT is the observable signal (the
    # cost-decrease test asserts actual convergence).
    assert np.median(err1) < 0.9 * np.median(err0), \
        f"median depth err {np.median(err0)} -> {np.median(err1)}"


def test_ba_joint_cost_decreases(setup, rng):
    seq, pyrs, q, t, uvp, gt_idepth, pv, K = setup
    noise = np.zeros((K, 6), np.float32)
    noise[1:] = rng.normal(0, 0.008, (K - 1, 6))
    Tn = [SE3(q[k], t[k]) @ SE3.exp(jnp.asarray(noise[k])) for k in range(K)]
    qn = jnp.stack([p.q for p in Tn])
    tn = jnp.stack([p.t for p in Tn])
    d0 = gt_idepth * (1.0 + rng.normal(0, 0.05, len(gt_idepth)))
    r0 = bundle_adjust_window(
        pyrs, qn, tn, jnp.ones(K, bool), uvp,
        jnp.asarray(d0.astype(np.float32)), pv,
        cam=seq.cam, num_iters=0, coarse_iters=0, level=1)
    r8 = bundle_adjust_window(
        pyrs, qn, tn, jnp.ones(K, bool), uvp,
        jnp.asarray(d0.astype(np.float32)), pv,
        cam=seq.cam, num_iters=12, level=1)
    assert float(r8.final_cost) < 0.85 * float(r0.final_cost), \
        f"cost {float(r0.final_cost)} -> {float(r8.final_cost)}"


def test_ba_exposure_drift(setup, rng):
    """Per-frame affine exposure (BENCH_NOTES roadmap item 7): one
    keyframe has a gain/offset change; affine BA still refines the
    perturbed pose and recovers the effective exposure map, while raw BA
    is biased by the brightness mismatch."""
    seq, pyrs, q, t, uvp, gt_idepth, pv, K = setup
    # Exposure change on frame 1: I' = 1.15*I + 12.
    pyrs_x = np.asarray(pyrs).copy()
    pyrs_x[1] = np.clip(1.15 * pyrs_x[1] + 12.0, 0.0, 255.0)
    pyrs_x = jnp.asarray(pyrs_x)
    noise = np.zeros((K, 6), np.float32)
    noise[1] = rng.normal(0, 0.02, 6)
    Tn = [SE3(q[k], t[k]) @ SE3.exp(jnp.asarray(noise[k])) for k in range(K)]
    qn = jnp.stack([p.q for p in Tn])
    tn = jnp.stack([p.t for p in Tn])
    before = _pose_errs(qn, tn, q, t, K)

    res = bundle_adjust_window(
        pyrs_x, qn, tn, jnp.ones(K, bool), uvp,
        jnp.asarray(gt_idepth.astype(np.float32)), pv,
        cam=seq.cam, num_iters=12, level=1, estimate_affine=True)
    after = _pose_errs(res.q, res.t, q, t, K)
    assert after[1] < before[1], (before, after)
    assert after.max() < 0.08, after
    # Effective exposure map for frame 1 ~ inverse of the injected one:
    # residual form is I_j - (g*I_ref + o) and frame 1 was brightened, so
    # g_1 should approach 1.15 (o trades off along the gain/offset
    # degeneracy; check the map at working intensities).
    g1, o1 = float(res.gains[1]), float(res.offsets[1])
    for I in (96.0, 128.0, 176.0):
        assert abs((g1 * I + o1) - (1.15 * I + 12.0)) < 14.0, (g1, o1, I)
    # Raw BA on the same window: the exposure mismatch biases the
    # photometric objective; affine BA must do at least as well on the
    # pose it perturbs.
    raw = bundle_adjust_window(
        pyrs_x, qn, tn, jnp.ones(K, bool), uvp,
        jnp.asarray(gt_idepth.astype(np.float32)), pv,
        cam=seq.cam, num_iters=12, level=1, estimate_affine=False)
    after_raw = _pose_errs(raw.q, raw.t, q, t, K)
    assert after[1] <= after_raw[1] + 1e-3, (after, after_raw)


def _gt_projections(seq, q, t, uvp, gt_idepth, pv, K):
    """GT pixel positions of the ref points in each true frame."""
    P = uvp.shape[0]
    X_ref = seq.cam.backproject(uvp, jnp.asarray(
        np.maximum(gt_idepth, 1e-6).astype(np.float32)))
    uv_gt = np.zeros((P, K, 2), np.float32)
    gt_ok = np.zeros((P, K), bool)
    for k in range(K):
        Tk = SE3(q[k], t[k])
        T0 = SE3(q[0], t[0])
        Xk = np.asarray(Tk.inverse().apply(T0.apply(X_ref)))
        ok = Xk[:, 2] > 1e-3
        uv_k = np.asarray(seq.cam.project(jnp.asarray(
            np.where(ok[:, None], Xk, [0.0, 0.0, 1.0]))))
        inb = (ok & (uv_k[:, 0] >= 4) & (uv_k[:, 0] <= seq.cam.width - 5)
               & (uv_k[:, 1] >= 4) & (uv_k[:, 1] <= seq.cam.height - 5))
        uv_gt[:, k] = uv_k
        gt_ok[:, k] = inb & np.asarray(pv)
    return uv_gt, gt_ok


def test_refine_matches_2d_removes_line_bias(setup):
    """Biased initial matches (GT + a systematic few-px offset, the shape
    of the wrong-pose epipolar-line projection error) must come back to
    the true correspondence."""
    from flame_ros_tpu.models.ba import refine_matches_2d
    seq, pyrs, q, t, uvp, gt_idepth, pv, K = setup
    uv_gt, gt_ok = _gt_projections(seq, q, t, uvp, gt_idepth, pv, K)
    rng = np.random.default_rng(3)
    bias = rng.normal(0, 2.5, (uv_gt.shape[0], K, 2)).astype(np.float32)
    bias += np.array([3.0, -2.0], np.float32)  # systematic component
    uv0 = uv_gt + bias
    uv_ref_pyr = pyrs[0]
    uv_new, ok = refine_matches_2d(
        uv_ref_pyr, uvp, pyrs, jnp.asarray(uv0), jnp.asarray(gt_ok))
    ok = np.asarray(ok) & gt_ok
    err0 = np.linalg.norm(uv0 - uv_gt, axis=-1)[ok]
    err1 = np.linalg.norm(np.asarray(uv_new) - uv_gt, axis=-1)[ok]
    assert ok.sum() > 200
    # Non-ref frames only carry signal; frame 0 is identity anyway.
    assert np.median(err1) < 0.6, (np.median(err0), np.median(err1))
    assert np.median(err1) < 0.25 * np.median(err0)


def test_product_path_matches_recover_far_keyframe(setup):
    """PRODUCT-path hybrid BA on the badly-perturbed-far-keyframe regime
    (>= 0.05 rad+m at a ~0.4 m baseline — the recorded round-2 failure):
    matches come from the real epipolar matcher under the WRONG poses
    (second-order line bias), then the 2-D refinement frees them from the
    line. Recovery must now happen without oracle matches."""
    from flame_ros_tpu.models.ba import (match_window_points,
                                         refine_matches_2d)
    seq, pyrs, q, t, uvp, gt_idepth, pv, K = setup
    rng = np.random.default_rng(11)
    noise = np.zeros((K, 6), np.float32)
    vec = rng.normal(0, 1, 6)
    noise[3] = 0.055 * vec / np.linalg.norm(vec)  # |tau| = 0.055 rad+m
    Tn = [SE3(q[k], t[k]) @ SE3.exp(jnp.asarray(noise[k]))
          for k in range(K)]
    qn = jnp.stack([p.q for p in Tn])
    tn = jnp.stack([p.t for p in Tn])
    before = _pose_errs(qn, tn, q, t, K)

    # Matches searched along the WRONG epipolar lines (product path).
    uv_obs, obs_ok = match_window_points(
        pyrs[0], qn[0], tn[0], pyrs, qn, tn, uvp,
        jnp.asarray(gt_idepth.astype(np.float32)), pv, cam=seq.cam)
    uv_ref2, ok2 = refine_matches_2d(pyrs[0], uvp, pyrs, uv_obs, obs_ok)

    # The refinement itself must reduce the match error vs GT.
    uv_gt, gt_ok = _gt_projections(seq, q, t, uvp, gt_idepth, pv, K)
    m = np.asarray(obs_ok) & np.asarray(ok2) & gt_ok
    e_line = np.linalg.norm(np.asarray(uv_obs) - uv_gt, axis=-1)[
        m[:, 3], 3] if m[:, 3].any() else np.array([np.inf])
    e_line = np.linalg.norm(np.asarray(uv_obs) - uv_gt, axis=-1)[:, 3][m[:, 3]]
    e_ref = np.linalg.norm(np.asarray(uv_ref2) - uv_gt, axis=-1)[:, 3][m[:, 3]]
    assert m[:, 3].sum() > 50, m.sum(0)
    assert np.median(e_ref) < np.median(e_line), (np.median(e_line),
                                                  np.median(e_ref))

    res = bundle_adjust_window(
        pyrs, qn, tn, jnp.ones(K, bool), uvp,
        jnp.asarray(gt_idepth.astype(np.float32)), pv,
        cam=seq.cam, num_iters=12, level=1,
        uv_obs=uv_ref2, obs_valid=ok2)
    after = _pose_errs(res.q, res.t, q, t, K)
    assert after[3] < 0.5 * before[3], (before, after)
    assert after.max() < 0.03, after


def test_ba_sharded_matches_unsharded(setup):
    """Distributed BA (SURVEY §7.6): sharding the point axis over a
    4-device mesh — Schur partial sums completed by psum — must agree
    with the single-device solve to f32 reduction-order tolerance."""
    import jax
    from jax.sharding import Mesh
    from flame_ros_tpu.models.ba import bundle_adjust_window_sharded
    if len(jax.devices()) < 4:
        pytest.skip("needs 4-device mesh")
    seq, pyrs, q, t, uvp, gt_idepth, pv, K = setup
    rng = np.random.default_rng(0)
    noise = rng.normal(0, 0.01, (K, 6)).astype(np.float32)
    noise[0] = 0
    Tn = [SE3(q[k], t[k]) @ SE3.exp(jnp.asarray(noise[k]))
          for k in range(K)]
    qn = jnp.stack([p.q for p in Tn])
    tn = jnp.stack([p.t for p in Tn])
    d0 = jnp.asarray(gt_idepth.astype(np.float32)) \
        * (1 + 0.05 * jnp.asarray(rng.normal(0, 1, uvp.shape[0]),
                                  jnp.float32))
    kw = dict(cam=seq.cam, num_iters=6, coarse_iters=4, level=1)
    r0 = bundle_adjust_window(pyrs, qn, tn, jnp.ones(K, bool), uvp, d0,
                              pv, **kw)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("feat",))
    r1 = bundle_adjust_window_sharded(
        mesh, pyrs, qn, tn, jnp.ones(K, bool), uvp, d0, pv,
        axis="feat", **kw)
    # f32 reduction-order tolerance: psum sums shards in a different
    # order than the single einsum (measured ~3e-5 worst case here).
    np.testing.assert_allclose(np.asarray(r0.q), np.asarray(r1.q),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(r0.t), np.asarray(r1.t),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(r0.idepths),
                               np.asarray(r1.idepths), atol=5e-4)
    assert int(r0.n_valid) == int(r1.n_valid)


@pytest.mark.parametrize("mag,clean", [(0.07, True), (0.09, True),
                                       (0.12, True), (0.15, False)])
def test_ba_recovery_envelope(setup, mag, clean):
    """Far-keyframe recovery envelope (VERDICT r2 item 7): with the
    discrete coarse-level pose pre-search (round 0 of the hybrid
    schedule), |tau| <= 0.12 rad+m recovers cleanly on every seed
    (round-2 boundary: 0.05; round-3 without pre-search: 0.07), and at
    0.15 there is no divergence — the remaining error stays strictly
    below the injected perturbation (without pre-search it ends at
    0.34, worse than the injection). Sweep data: BENCH_NOTES round-3
    envelope tables."""
    from flame_ros_tpu.models.ba import hybrid_bundle_adjust
    seq, pyrs, q, t, uvp, gt_idepth, pv, K = setup
    for seed in (7, 11, 3):
        rng = np.random.default_rng(seed)
        vec = rng.normal(0, 1, 6)
        noise = np.zeros((K, 6), np.float32)
        noise[3] = mag * vec / np.linalg.norm(vec)
        Tn = [SE3(q[k], t[k]) @ SE3.exp(jnp.asarray(noise[k]))
              for k in range(K)]
        qn = jnp.stack([p.q for p in Tn])
        tn = jnp.stack([p.t for p in Tn])
        res = hybrid_bundle_adjust(
            pyrs, qn, tn, jnp.ones(K, bool), uvp,
            jnp.asarray(gt_idepth.astype(np.float32)), pv,
            cam=seq.cam, rounds=3, num_iters=12)
        after = _pose_errs(res.q, res.t, q, t, K)
        if clean:
            # The clean bar is absolute (< 0.06 rad+m). No relative bar
            # here: at a basin boundary the converged optimum is
            # sensitive to f32 reduction order
            # (xla_force_host_platform_device_count splits the CPU
            # thread pool; measured 0.017 on 1 device vs 0.054 on 8 for
            # mag=0.07/seed=7 without pre-search — both clean).
            assert after[3] < 0.06, (mag, seed, after)
        else:
            # Beyond the clean envelope: no divergence — the error must
            # end strictly below the injected perturbation (without
            # pre-search the 0.15 case ends at 0.34, WORSE than the
            # perturbation).
            assert after[3] < mag, (mag, seed, after)
        assert after.max() <= after[3] + 1e-6 or after.max() < 0.06, \
            (mag, seed, after)


def test_ba_reprojection_constraints_recover_far_keyframe(setup):
    """Hybrid BA: pixel-match (reprojection) residuals are near-convex
    over pose errors that photometric-only BA cannot recover — a badly
    perturbed FAR keyframe (the wrong-basin failure recorded in
    BENCH_NOTES item 7) comes back once matches are supplied."""
    seq, pyrs, q, t, uvp, gt_idepth, pv, K = setup
    rng = np.random.default_rng(7)
    noise = np.zeros((K, 6), np.float32)
    noise[3] = rng.normal(0, 0.02, 6)  # far keyframe, ~0.4 m baseline
    Tn = [SE3(q[k], t[k]) @ SE3.exp(jnp.asarray(noise[k])) for k in range(K)]
    qn = jnp.stack([p.q for p in Tn])
    tn = jnp.stack([p.t for p in Tn])
    before = _pose_errs(qn, tn, q, t, K)

    # Observed matches: GT projections of the points into each TRUE
    # frame + 0.3 px match noise (what the epipolar matcher supplies).
    P = uvp.shape[0]
    X_ref = seq.cam.backproject(uvp, jnp.asarray(
        np.maximum(gt_idepth, 1e-6).astype(np.float32)))
    uv_obs = np.zeros((P, K, 2), np.float32)
    obs_ok = np.zeros((P, K), bool)
    for k in range(K):
        Tk = SE3(q[k], t[k])
        T0 = SE3(q[0], t[0])
        Xk = np.asarray(Tk.inverse().apply(T0.apply(X_ref)))
        ok = Xk[:, 2] > 1e-3
        uv_k = np.asarray(seq.cam.project(jnp.asarray(
            np.where(ok[:, None], Xk, [0.0, 0.0, 1.0]))))
        inb = (ok & (uv_k[:, 0] >= 1) & (uv_k[:, 0] <= seq.cam.width - 2)
               & (uv_k[:, 1] >= 1) & (uv_k[:, 1] <= seq.cam.height - 2))
        uv_obs[:, k] = uv_k + rng.normal(0, 0.3, (P, 2))
        obs_ok[:, k] = inb & np.asarray(pv)

    res = bundle_adjust_window(
        pyrs, qn, tn, jnp.ones(K, bool), uvp,
        jnp.asarray(gt_idepth.astype(np.float32)), pv,
        cam=seq.cam, num_iters=12, level=1,
        uv_obs=jnp.asarray(uv_obs), obs_valid=jnp.asarray(obs_ok))
    after = _pose_errs(res.q, res.t, q, t, K)
    # Photometric-only BA leaves this scenario at ~1.1x the input error
    # (measured); with matches the far keyframe must genuinely recover
    # and no other frame may be dragged off.
    assert after[3] < 0.4 * before[3], (before, after)
    assert after.max() < 0.02, after


def test_hybrid_sharded_matches_unsharded(setup):
    """The pod-scale live-path solver (hybrid_bundle_adjust_sharded —
    matches replicated, window solve point-sharded) must agree with the
    single-device one-round hybrid to f32 reduction-order tolerance."""
    import jax
    from jax.sharding import Mesh
    from flame_ros_tpu.models.ba import (hybrid_bundle_adjust,
                                         hybrid_bundle_adjust_sharded)
    if len(jax.devices()) < 4:
        pytest.skip("needs 4-device mesh")
    seq, pyrs, q, t, uvp, gt_idepth, pv, K = setup
    rng = np.random.default_rng(1)
    noise = rng.normal(0, 0.01, (K, 6)).astype(np.float32)
    noise[0] = 0
    Tn = [SE3(q[k], t[k]) @ SE3.exp(jnp.asarray(noise[k]))
          for k in range(K)]
    qn = jnp.stack([p.q for p in Tn])
    tn = jnp.stack([p.t for p in Tn])
    d0 = jnp.asarray(gt_idepth.astype(np.float32))
    kw = dict(cam=seq.cam, num_iters=4, coarse_iters=2, level=1)
    r0 = hybrid_bundle_adjust(pyrs, qn, tn, jnp.ones(K, bool), uvp, d0,
                              pv, rounds=1, **kw)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("feat",))
    r1 = hybrid_bundle_adjust_sharded(
        mesh, pyrs, qn, tn, jnp.ones(K, bool), uvp, d0, pv, **kw)
    np.testing.assert_allclose(np.asarray(r0.q), np.asarray(r1.q),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(r0.t), np.asarray(r1.t),
                               atol=2e-4)
    assert np.isfinite(float(r1.final_cost))

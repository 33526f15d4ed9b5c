import numpy as np
import jax.numpy as jnp
import pytest

from flame_ros_tpu.config import FlameParams
from flame_ros_tpu.datasets.synthetic import make_sequence, QVGA
from flame_ros_tpu.geometry.se3 import SE3
from flame_ros_tpu.models.engine import Flame


def _small_params(**overrides):
    d = {
        "engine": {"max_features": 512, "max_keyframes": 4,
                   "pd_iters_per_frame": 30},
        "input": {"poseframe_subsample_factor": 6},
    }
    for k, v in overrides.items():
        d.setdefault(k, {}).update(v)
    return FlameParams.from_dict(d)


@pytest.fixture(scope="module")
def seq():
    return make_sequence(n_frames=18, cam=QVGA, motion="strafe")


def _run(seq, params, n=18, truth=False):
    engine = Flame(seq.cam.width, seq.cam.height, cam=seq.cam,
                   params=params)
    for i in range(n):
        pose = SE3(seq.poses.q[i], seq.poses.t[i])
        ok = engine.update(
            seq.timestamps[i], i, pose, seq.images[i],
            is_poseframe=(i % 6 == 0),
            idepths_truth=(1.0 / np.maximum(seq.depths[i], 1e-6)
                           if truth else None))
        assert ok
    return engine


def _dense_err(engine, seq, frame):
    est = engine.get_inverse_depth_map()
    gt = np.where(seq.depths[frame] > 0,
                  1.0 / np.maximum(seq.depths[frame], 1e-6), 0.0)
    m = np.isfinite(est) & (gt > 0)
    return est, gt, m


def test_engine_end_to_end(seq):
    """Golden slice: full engine on synthetic, dense idepth near GT."""
    engine = _run(seq, _small_params())
    est, gt, m = _dense_err(engine, seq, 17)
    assert m.mean() > 0.4, f"coverage {m.mean()}"
    err = np.abs(est - gt)[m]
    assert np.median(err) < 0.02, f"median dense idepth err {np.median(err)}"
    # The RMSE tail is dominated by a few wrong-lobe patches (tracked in
    # BENCH_NOTES; the L1 regularizer bounds but does not remove them) and
    # is sensitive to raster tie-breaks — use inlier statistics.
    inlier = err < 0.1
    assert inlier.mean() > 0.85, f"inlier fraction {inlier.mean()}"
    assert np.sqrt((err[inlier] ** 2).mean()) < 0.05, \
        f"inlier rmse {np.sqrt((err[inlier] ** 2).mean())}"

    # Telemetry uses the reference vocabulary.
    engine.flush_stats()
    rec = engine.stats().to_record(17, seq.timestamps[17])
    assert rec["num_feats"] > 100
    assert rec["num_tris"] > 100
    assert rec["coverage"] > 0.4
    assert rec["update_ms"] > 0
    assert "num_fail_max_cost" in rec

    # Mesh getter: compacted products with consistent shapes.
    uv, x, normals, tris, keep, edges = engine.get_inverse_depth_mesh()
    assert tris.shape[1] == 3 and edges.shape[1] == 2
    assert keep.shape[0] == tris.shape[0]
    assert np.abs(np.linalg.norm(normals, axis=1) - 1).max() < 1e-4

    # Raw idepths (posterior mean/var) for live features.
    vtx, mu, var = engine.get_raw_idepths()
    assert len(vtx) == len(mu) == len(var) > 100


def test_engine_truth_injection(seq):
    """pass_in_truth harness: with oracle depth the dense map is near-exact
    (isolates graph/raster from the depth filter, reference
    src/flame_offline_tum.cc:577-595)."""
    engine = _run(seq, _small_params(), n=13, truth=True)
    est, gt, m = _dense_err(engine, seq, 12)
    assert m.mean() > 0.4
    err = np.abs(est - gt)[m]
    assert np.median(err) < 0.01, f"median {np.median(err)}"


def test_engine_update_returns_and_continues(seq):
    """A frame with a wildly wrong pose must not kill the engine."""
    params = _small_params()
    engine = Flame(seq.cam.width, seq.cam.height, cam=seq.cam, params=params)
    for i in range(7):
        pose = SE3(seq.poses.q[i], seq.poses.t[i])
        assert engine.update(seq.timestamps[i], i, pose, seq.images[i],
                             is_poseframe=(i % 6 == 0))
    bad_pose = SE3.exp(jnp.array([5.0, 5, 5, 1, 1, 1.0]))
    assert engine.update(seq.timestamps[7], 7, bad_pose, seq.images[7],
                         is_poseframe=False)
    # Subsequent good frame still processes.
    pose = SE3(seq.poses.q[8], seq.poses.t[8])
    assert engine.update(seq.timestamps[8], 8, pose, seq.images[8],
                         is_poseframe=False)


def test_poseframe_prune_and_update(seq):
    engine = _run(seq, _small_params(), n=13)
    kf_ids = np.asarray(engine.state.kf_ids)
    live = kf_ids[np.asarray(engine.state.kf_valid)]
    assert set(live) == {0, 6, 12}
    # Nudge a poseframe pose.
    new_pose = SE3(seq.poses.q[6], seq.poses.t[6] + 0.01)
    engine.update_poseframe_poses([6], SE3(new_pose.q[None], new_pose.t[None]))
    idx = np.flatnonzero(kf_ids == 6)[0]
    np.testing.assert_allclose(np.asarray(engine.state.kf_t)[idx],
                               np.asarray(seq.poses.t[6]) + 0.01, atol=1e-6)
    # Prune poseframe 0: its features die.
    n_before = int(np.asarray(engine.state.feat.valid).sum())
    engine.prune_poseframes([6, 12])
    assert not np.asarray(engine.state.kf_valid)[kf_ids == 0].any()
    feat_kf = np.asarray(engine.state.feat.kf_idx)
    valid = np.asarray(engine.state.feat.valid)
    slot0 = np.flatnonzero(kf_ids == 0)[0]
    assert not (valid & (feat_kf == slot0)).any()
    assert valid.sum() < n_before


def test_update_window_matches_sequential(seq):
    """A window dispatch must produce the same state as frame-by-frame
    updates (both use the traced poseframe branch; triangulation lands at
    the window boundary, so compare at a boundary)."""
    params = _small_params()
    a = Flame(seq.cam.width, seq.cam.height, cam=seq.cam, params=params)
    b = Flame(seq.cam.width, seq.cam.height, cam=seq.cam, params=params)
    # Sequential singles.
    for i in range(12):
        pose = SE3(seq.poses.q[i], seq.poses.t[i])
        assert a.update(seq.timestamps[i], i, pose, seq.images[i],
                        is_poseframe=(i % 6 == 0))
    # Two windows of 6 (pf-aligned).
    for w in range(2):
        frames = [(seq.timestamps[i], i, SE3(seq.poses.q[i], seq.poses.t[i]),
                   seq.images[i], i % 6 == 0)
                  for i in range(6 * w, 6 * w + 6)]
        assert b.update_window(frames)
    # Window path quantizes images to uint8; compare with tolerance.
    xa = np.asarray(a.state.vtx_x)
    xb = np.asarray(b.state.vtx_x)
    va = np.asarray(a.state.vtx_in_graph)
    vb = np.asarray(b.state.vtx_in_graph)
    assert (va == vb).mean() > 0.97
    m = va & vb
    assert np.median(np.abs(xa[m] - xb[m])) < 0.01
    recs = b.flush_window_stats()
    assert len(recs) == 6
    assert recs[-1]["num_feats"] > 100


def test_prefetch_window_matches_plain(seq):
    """The double-buffered upload path (prefetch_window +
    update_window(prefetched=...)) must be bit-identical to plain
    update_window: packing is shared, only the H2D is threaded."""
    params = _small_params()
    a = Flame(seq.cam.width, seq.cam.height, cam=seq.cam, params=params)
    b = Flame(seq.cam.width, seq.cam.height, cam=seq.cam, params=params)

    def win(w):
        # Wrap past the fixture's 18 frames (ordering checks reuse data).
        return [(seq.timestamps[i % 18] + i // 18, i,
                 SE3(seq.poses.q[i % 18], seq.poses.t[i % 18]),
                 seq.images[i % 18], i % 6 == 0)
                for i in range(6 * w, 6 * w + 6)]

    for w in range(3):
        assert a.update_window(win(w))
    # Pipelined: window w+1 uploads while window w computes.
    pre = b.prefetch_window(win(0))
    for w in range(3):
        nxt = b.prefetch_window(win(w + 1)) if w + 1 < 3 else None
        assert b.update_window(prefetched=pre)
        pre = nxt
    np.testing.assert_array_equal(np.asarray(a.state.vtx_x),
                                  np.asarray(b.state.vtx_x))
    np.testing.assert_array_equal(np.asarray(a.state.vtx_in_graph),
                                  np.asarray(b.state.vtx_in_graph))
    np.testing.assert_array_equal(np.asarray(a.state.edge_q),
                                  np.asarray(b.state.edge_q))
    # Out-of-order consumption is rejected.
    h1 = b.prefetch_window(win(3))
    h2 = b.prefetch_window(win(4))
    with pytest.raises(RuntimeError):
        b.update_window(prefetched=h2)
    # Plain updates are rejected while prefetches are outstanding.
    with pytest.raises(RuntimeError):
        b.update_window(win(5))
    assert b.update_window(prefetched=h1)
    assert b.update_window(prefetched=h2)


def test_deferred_triangulation(seq):
    """Deferred mode: topology lands one window late but quality holds."""
    params = _small_params()
    eng = Flame(seq.cam.width, seq.cam.height, cam=seq.cam, params=params,
                deferred_triangulation=True)
    for w in range(3):
        frames = [(seq.timestamps[i], i, SE3(seq.poses.q[i], seq.poses.t[i]),
                   seq.images[i], i % 6 == 0)
                  for i in range(6 * w, 6 * w + 6)]
        assert eng.update_window(frames)
    est, gt, m = _dense_err(eng, seq, 17)
    assert m.mean() > 0.3
    err = np.abs(est - gt)[m]
    assert np.median(err) < 0.03, f"median {np.median(err)}"


def test_merged_topology_upload(seq):
    """topo_upload="merged" (default): a finished deferred triangulation
    rides the NEXT window's packed H2D as a byte tail — one transfer per
    window, no separate topology upload — and the installed topology is
    identical to the separate-upload mode's."""
    params = _small_params()
    engines = {}
    for mode in ("merged", "separate"):
        eng = Flame(seq.cam.width, seq.cam.height, cam=seq.cam,
                    params=params, deferred_triangulation=True,
                    topo_upload=mode)
        carried = []
        orig = eng._dispatch_packed

        def spy(*a, _eng=eng, _carried=carried, _orig=orig, **kw):
            _carried.append(kw.get("topo_len", 0))
            return _orig(*a, **kw)
        eng._dispatch_packed = spy
        for w in range(3):
            frames = [(seq.timestamps[i], i,
                       SE3(seq.poses.q[i], seq.poses.t[i]),
                       seq.images[i], i % 6 == 0)
                      for i in range(6 * w, 6 * w + 6)]
            assert eng.update_window(frames)
            # Let the tri worker finish so the next pack can merge it.
            if eng._pending_tri:
                eng._pending_tri[0].result()
        engines[mode] = (eng, carried)
    eng_m, carried_m = engines["merged"]
    eng_s, carried_s = engines["separate"]
    assert sum(1 for t in carried_m if t > 0) >= 2  # topologies rode windows
    assert all(t == 0 for t in carried_s)           # separate never merges
    # Same installed topology state on both paths.
    np.testing.assert_array_equal(np.asarray(eng_m.state.tris),
                                  np.asarray(eng_s.state.tris))
    np.testing.assert_array_equal(np.asarray(eng_m.state.edge_valid),
                                  np.asarray(eng_s.state.edge_valid))
    assert int(eng_m.state.topo_frame_id) == int(eng_s.state.topo_frame_id)
    est, gt, m = _dense_err(eng_m, seq, 17)
    err = np.abs(est - gt)[m]
    assert np.median(err) < 0.03, f"median {np.median(err)}"


def test_deferred_triangulation_pipeline(seq):
    """The deferred-triangulation pipeline is bounded (<= 2 jobs in
    flight), installs every built topology in issue order, and drains
    fully on a blocking getter."""
    params = _small_params()
    eng = Flame(seq.cam.width, seq.cam.height, cam=seq.cam, params=params,
                deferred_triangulation=True, tri_backpressure="block")
    installed = []
    orig = eng._install_topology

    def spy(packed, **kw):
        installed.append(packed)
        return orig(packed, **kw)
    eng._install_topology = spy
    for w in range(4):
        frames = [(seq.timestamps[i % 18], 100 * w + i,
                   SE3(seq.poses.q[i % 18], seq.poses.t[i % 18]),
                   seq.images[i % 18], i % 6 == 0)
                  for i in range(6 * w, 6 * w + 6)]
        assert eng.update_window(frames)
        assert len(eng._pending_tri) <= 2
    eng._apply_pending_triangulation(block=True)
    assert not eng._pending_tri
    assert len(installed) == 4  # every scheduled job installed, none lost


def test_deferred_triangulation_drop_backpressure(seq):
    """Default drop policy: when the pipeline is full, a poseframe's
    retriangulation is skipped (counted), never blocking the dispatch
    path — the reference's drop-on-full queue philosophy."""
    import threading
    params = _small_params()
    eng = Flame(seq.cam.width, seq.cam.height, cam=seq.cam, params=params,
                deferred_triangulation=True)
    assert eng.tri_backpressure == "drop"
    # Simulate a slow link: stall the tri worker so jobs pile up.
    gate = threading.Event()
    orig_build = eng._build_topology_host

    def slow_build(uv, el, wm=2 ** 30):
        gate.wait(timeout=30.0)
        return orig_build(uv, el, wm)
    eng._build_topology_host = slow_build
    try:
        for w in range(4):
            frames = [(seq.timestamps[i % 18], 100 * w + i,
                       SE3(seq.poses.q[i % 18], seq.poses.t[i % 18]),
                       seq.images[i % 18], i % 6 == 0)
                      for i in range(6 * w, 6 * w + 6)]
            assert eng.update_window(frames)
            assert len(eng._pending_tri) <= 2
    finally:
        gate.set()
    assert eng._tri_dropped >= 1  # 4 poseframes, 2 slots -> drops
    eng._apply_pending_triangulation(block=True)
    assert not eng._pending_tri


def test_topology_install_monotonic_watermark(seq):
    """Installs are monotonic in the build watermark (round-5 review):
    in the prefetched streaming loop a pack-time-merged topology arrives
    PREFETCH-DEPTH windows after it was merged, by which time the async
    drain may have installed a NEWER build — installing the older one
    would roll topo_frame_id backwards and re-mask fresh triangles.
    Older-than-installed watermarks are skipped; unknown (wm=None)
    installs are unconditional and leave the guard untouched."""
    import jax

    params = _small_params()
    eng = _run(seq, params, n=7)
    uv = np.asarray(eng.state.vtx_uv)
    elig = np.asarray(eng.state.vtx_in_graph) > 0
    new = jax.device_put(eng._build_topology_host(uv, elig, 10))
    old = jax.device_put(eng._build_topology_host(uv, elig, 5))
    n0 = eng._topo_installs
    eng._install_topology(new, wm=10)
    assert eng._topo_installs == n0 + 1
    assert int(eng.state.topo_frame_id) == 10
    sup0 = eng._tri_superseded
    eng._install_topology(old, wm=5)   # older: must be skipped
    assert eng._topo_installs == n0 + 1
    assert int(eng.state.topo_frame_id) == 10
    assert eng._tri_superseded == sup0 + 1
    eng._install_topology(old, wm=10)  # equal wm: allowed
    assert eng._topo_installs == n0 + 2
    forced = jax.device_put(eng._build_topology_host(uv, elig, 2 ** 30))
    eng._install_topology(forced, wm=None)  # forced: unconditional,
    assert eng._topo_installs == n0 + 3     # guard untouched
    assert eng._installed_topo_wm == 10


def test_streaming_coverage_survives_ring_wraps():
    """Round-5 regression guard for the streaming-path map collapse:
    the windowed/prefetched loop (deferred triangulation, merged topo
    upload — the product streaming configuration) must keep dense
    coverage STABLE through multiple keyframe-ring wraps. Before the
    round-5 fixes (newest-only topology installs, dispatch-time
    installs, reanchor_on_evict) every wrap mass-killed the recycled
    slot's features and the lagged topology's freshness watermark
    masked 60-90% of the map for ~4 poseframe periods (coverage
    0.83 -> 0.10 at VGA/200) while fps and drop counters looked
    perfect."""
    cam = QVGA
    long_seq = make_sequence(n_frames=90, cam=cam, motion="strafe")
    params = _small_params()
    eng = Flame(cam.width, cam.height, cam=cam, params=params,
                deferred_triangulation=True, topo_upload="merged")

    def win(w):
        return [(long_seq.timestamps[i], i,
                 SE3(long_seq.poses.q[i], long_seq.poses.t[i]),
                 long_seq.images[i], i % 6 == 0)
                for i in range(6 * w, 6 * w + 6)]

    n_win = 14   # 14 poseframes over max_keyframes=4 -> 3+ ring wraps
    covs = []
    pre = eng.prefetch_window(win(0))
    nxt = eng.prefetch_window(win(1))
    for w in range(n_win):
        assert eng.update_window(prefetched=pre)
        pre, nxt = nxt, (eng.prefetch_window(win(w + 2))
                         if w + 2 < n_win else None)
        covs.append(float(np.isfinite(eng.get_inverse_depth_map())
                          .mean()))
    eng._apply_pending_triangulation(block=True)
    eng.shutdown()
    steady = np.asarray(covs[4:])   # skip map build-up
    assert steady.max() > 0.4, f"map never built: {covs}"
    # The collapse signature is coverage decaying to a fraction of its
    # peak and staying there; stable streaming keeps every steady
    # window within a factor ~2 of the peak.
    assert steady.min() > 0.5 * steady.max(), f"coverage collapse: {covs}"
    assert steady[-1] > 0.3, f"final coverage {steady[-1]}: {covs}"


def test_checkpoint_resume(seq, tmp_path):
    """Save mid-run, resume in a fresh engine, continue: identical output
    to an uninterrupted run (bitwise state restore)."""
    params = _small_params()
    a = _run(seq, params, n=8)
    ckpt = str(tmp_path / "engine.npz")
    a.save_checkpoint(ckpt)

    b = Flame(seq.cam.width, seq.cam.height, cam=seq.cam, params=params)
    b.load_checkpoint(ckpt)
    for i in range(8, 12):
        pose = SE3(seq.poses.q[i], seq.poses.t[i])
        assert a.update(seq.timestamps[i], i, pose, seq.images[i],
                        is_poseframe=(i % 6 == 0))
        assert b.update(seq.timestamps[i], i, pose, seq.images[i],
                        is_poseframe=(i % 6 == 0))
    ia = a.get_inverse_depth_map()
    ib = b.get_inverse_depth_map()
    np.testing.assert_array_equal(np.isfinite(ia), np.isfinite(ib))
    m = np.isfinite(ia)
    np.testing.assert_allclose(ia[m], ib[m], atol=1e-6)

    # Wrong capacity -> clear error.
    import pytest
    bad = Flame(seq.cam.width, seq.cam.height, cam=seq.cam,
                params=_small_params(engine={"max_features": 256}))
    with pytest.raises(ValueError, match="capacity"):
        bad.load_checkpoint(ckpt)


def test_keyframe_ring_eviction(seq):
    """When the keyframe ring wraps, features referencing the recycled
    slot die (reference: features are bound to their origin poseframe)."""
    params = _small_params()  # max_keyframes=4, pf every 6
    engine = _run(seq, params, n=18)  # poseframes at 0, 6, 12 -> slots 0..2
    kf_ids = np.asarray(engine.state.kf_ids)
    assert set(kf_ids[np.asarray(engine.state.kf_valid)]) == {0, 6, 12}
    feat_kf = np.asarray(engine.state.feat.kf_idx)
    valid = np.asarray(engine.state.feat.valid)
    n_slot0 = int((valid & (feat_kf == 0)).sum())
    assert n_slot0 > 0
    # Drive two more poseframes: slot 3 fills, then slot 0 is recycled.
    for i in range(18, 30):
        j = i % 18
        pose = SE3(seq.poses.q[j], seq.poses.t[j])
        engine.update(seq.timestamps[j] + 1.0, i, pose,
                      seq.images[j], is_poseframe=(i % 6 == 0))
    kf_ids2 = np.asarray(engine.state.kf_ids)
    assert 24 in set(kf_ids2)  # slot 0 recycled to poseframe id 24
    feat_kf2 = np.asarray(engine.state.feat.kf_idx)
    valid2 = np.asarray(engine.state.feat.valid)
    ages = np.asarray(engine.state.feat.frame_id)
    # No live feature may still reference slot 0 with a pre-recycle age.
    stale = valid2 & (feat_kf2 == 0) & (ages < 24)
    assert not stale.any()


def test_filtered_idepth_map(seq):
    engine = _run(seq, _small_params(), n=13)
    filt = engine.get_filtered_inverse_depth_map()
    raw = engine.get_inverse_depth_map()
    # Filtering can only reduce coverage.
    assert np.isfinite(filt).sum() <= np.isfinite(raw).sum()


def test_update_fails_on_garbage_inputs_and_recovers(seq):
    """Reference semantics: update() returns false on a real failure and
    the engine continues (src/flame_nodelet.cc:637-642). Garbage inputs
    are rejected host-side; device-state divergence trips the health
    word, the next update fails once, state is sanitized, and the run
    continues."""
    engine = _run(seq, _small_params(), n=7)

    # 1. Garbage pose (NaN translation) -> immediate False, no upload.
    bad_pose = SE3(seq.poses.q[7], np.array([np.nan, 0.0, 0.0]))
    assert engine.update(seq.timestamps[7], 7, bad_pose,
                         seq.images[7], is_poseframe=False) is False
    assert engine.num_failed_frames == 1

    # 2. Unnormalized quaternion -> False.
    bad_q = SE3(np.array([2.0, 0.0, 0.0, 0.0]), seq.poses.t[7])
    assert engine.update(seq.timestamps[7], 7, bad_q,
                         seq.images[7], is_poseframe=False) is False

    # 3. Good frame still succeeds after rejections.
    pose = SE3(seq.poses.q[7], seq.poses.t[7])
    assert engine.update(seq.timestamps[7], 7, pose, seq.images[7],
                         is_poseframe=False)
    rec = engine.flush_stats()
    assert rec["health"] == 1.0

    # 4. Inject device-side divergence (non-finite filter posterior), pull
    #    telemetry -> health word trips -> next update fails once and
    #    sanitizes; the one after succeeds with finite state. (NaN vertex
    #    primals are already self-healed by the projection gate in
    #    _track_step; the posterior is the state that can actually carry
    #    divergence forward.)
    f = engine.state.feat
    mu = np.asarray(f.mu).copy()
    live = np.where(np.asarray(f.valid))[0]
    assert live.size > 0
    mu[live[:32]] = np.nan
    engine.state = engine.state._replace(feat=f._replace(mu=jnp.asarray(mu)))
    pose8 = SE3(seq.poses.q[8], seq.poses.t[8])
    engine.update(seq.timestamps[8], 8, pose8, seq.images[8],
                  is_poseframe=False)
    rec = engine.flush_stats()
    assert rec["health"] == 0.0
    failed_before = engine.num_failed_frames
    pose9 = SE3(seq.poses.q[9], seq.poses.t[9])
    assert engine.update(seq.timestamps[9], 9, pose9, seq.images[9],
                         is_poseframe=False) is False
    assert engine.num_failed_frames == failed_before + 1
    assert np.isfinite(np.asarray(engine.state.feat.mu)).all()
    assert engine.update(seq.timestamps[10], 10, pose9, seq.images[9],
                         is_poseframe=False)
    rec = engine.flush_stats()
    assert rec["health"] == 1.0


def test_update_window_fails_on_recovery_flag(seq):
    """update_window honors the same failure gate as update()."""
    engine = _run(seq, _small_params(), n=7)
    engine._needs_recovery = True
    frames = [(seq.timestamps[7], 7,
               SE3(seq.poses.q[7], seq.poses.t[7]), seq.images[7], False)]
    assert engine.update_window(frames) is False
    assert engine.num_failed_frames == 1
    assert engine.update_window(frames) is True


def test_profile_stages_populates_timing_vocabulary(seq):
    """debug.profile_stages fills the reference's 13-stage timing keys
    (msg/FlameStats.msg:31-46) with nonzero device-cost measurements."""
    params = _small_params(debug={"profile_stages": True,
                                  "profile_stages_every": 5})
    engine = _run(seq, params, n=7)
    t = engine.stats_.timings()
    for key in ("frame_creation", "update_idepths", "project_features",
                "project_graph", "keyframe", "detection", "detection_loop",
                "interpolate", "sync_graph", "triangulate"):
        assert key in t, f"missing stage timing {key}"
        assert t[key] >= 0.0
    # The hot stages must carry real (nonzero) measurements.
    assert t["update_idepths"] > 0.0
    assert t["sync_graph"] > 0.0
    assert t["triangulate"] > 0.0
    # Disabled filters report 0 (reference: stages not run are 0).
    assert t["median_filter"] == 0.0 or t["median_filter"] >= 0.0
    rec = engine.stats_.to_record(7, 0.0)
    assert rec["update_idepths_ms"] == t["update_idepths"]


def test_bfloat16_gathers_match_accuracy(seq):
    """compute_dtype=bfloat16 (bf16 epipolar patch gathers) must not
    change dense accuracy materially vs float32 (quantization <= 1 gray
    level, far below the photometric noise model)."""
    engine = _run(seq, _small_params(engine={"compute_dtype": "bfloat16"}))
    est, gt, m = _dense_err(engine, seq, 17)
    assert m.mean() > 0.4, f"coverage {m.mean()}"
    err = np.abs(est - gt)[m]
    assert np.median(err) < 0.02, f"median dense idepth err {np.median(err)}"
    assert (err < 0.1).mean() > 0.85


def test_shutdown_lifecycle(seq):
    """shutdown() joins the worker pools, drops in-flight work, and the
    engine stays usable afterwards (pools recreate lazily)."""
    params = _small_params()
    eng = Flame(seq.cam.width, seq.cam.height, cam=seq.cam, params=params,
                deferred_triangulation=True)
    frames = [(seq.timestamps[i], i, SE3(seq.poses.q[i], seq.poses.t[i]),
               seq.images[i], i % 6 == 0) for i in range(6)]
    assert eng.update_window(frames)
    h = eng.prefetch_window([(seq.timestamps[i], 6 + i,
                              SE3(seq.poses.q[i], seq.poses.t[i]),
                              seq.images[i], i == 0) for i in range(6)])
    assert h is not None
    eng.shutdown()
    assert not eng._prefetch_issued and not eng._pending_tri
    assert eng._h2d_pool is None and eng._tri_pool is None
    # Still usable: a fresh window processes fine.
    frames2 = [(seq.timestamps[i], 12 + i,
                SE3(seq.poses.q[i], seq.poses.t[i]),
                seq.images[i], i == 0) for i in range(6)]
    assert eng.update_window(frames2)
    eng.shutdown()  # idempotent


def test_split_pf_dispatch_quality(seq):
    """Splitting a poseframe window into [pf] + [rest] dispatches (the
    deferred-triangulation default) snapshots the triangulation's vertex
    positions AT the poseframe (closer to reference semantics — the
    graph belongs to the poseframe, src/flame_nodelet.cc:632) instead of
    at window end, so states are not bitwise comparable; both modes must
    meet the same dense-quality bar and install every topology."""
    params = _small_params()
    for split in (True, False):
        eng = Flame(seq.cam.width, seq.cam.height, cam=seq.cam,
                    params=params, deferred_triangulation=True)
        eng.split_pf_dispatch = split
        for w in range(3):
            frames = [(seq.timestamps[i], i,
                       SE3(seq.poses.q[i], seq.poses.t[i]),
                       seq.images[i], i % 6 == 0)
                      for i in range(6 * w, 6 * w + 6)]
            assert eng.update_window(frames)
            if eng._pending_tri:  # let the job land before the next pack
                eng._pending_tri[0].result()
        recs = eng.flush_window_stats()
        assert len(recs) == 6
        est, gt, m = _dense_err(eng, seq, 17)
        assert m.mean() > 0.3, (split, m.mean())
        err = np.abs(est - gt)[m]
        assert np.median(err) < 0.03, (split, np.median(err))
        assert int(np.asarray(eng.state.tri_valid).sum()) > 100


def test_timing_keys_reset_between_paths(seq):
    """Last-value stage timings must not leak across update paths: a
    prefetched window records its real upload wait (update_locking);
    a subsequent plain window resets it to zero."""
    params = _small_params()
    eng = Flame(seq.cam.width, seq.cam.height, cam=seq.cam, params=params)

    def win(w):
        return [(seq.timestamps[i], i, SE3(seq.poses.q[i], seq.poses.t[i]),
                 seq.images[i], i % 6 == 0) for i in range(6 * w, 6 * w + 6)]

    pre = eng.prefetch_window(win(0))
    assert eng.update_window(prefetched=pre)
    rec = eng.stats().to_record(5, 0.0)
    assert rec["update_locking_ms"] >= 0.0  # set by the prefetched path
    assert eng.update_window(win(1))
    rec = eng.stats().to_record(11, 0.0)
    assert rec["update_locking_ms"] == 0.0  # reset on the plain path
    assert rec["dispatch_pf_ms"] == 0.0     # split inactive (no deferred)


def test_display_filters_improve_accuracy_at_occlusions():
    """On the primitives scene (real depth discontinuities), the
    reference's display filters (oblique-triangle / long-edge /
    min-idepth, src/flame_nodelet.cc:644-715) must measurably clean the
    dense map: triangles bridging fore/background get filtered, so the
    FILTERED map beats the raw map decisively on abs_rel and delta1."""
    import jax.numpy as jnp
    from flame_ros_tpu.eval.metrics import depth_metrics
    seq = make_sequence(n_frames=40, cam=QVGA, scene="primitives")
    engine = _run(seq, FlameParams(), n=40)
    gt = jnp.asarray(seq.depths[39], jnp.float32)
    raw = jnp.asarray(engine.get_inverse_depth_map())
    filt = jnp.asarray(engine.get_filtered_inverse_depth_map())
    mr = {k: float(v) for k, v in depth_metrics(raw, gt).items()}
    mf = {k: float(v) for k, v in depth_metrics(filt, gt).items()}
    # Meaningful scene coverage in both maps.
    assert float(jnp.isfinite(raw).mean()) > 0.6
    assert float(jnp.isfinite(filt).mean()) > 0.3
    assert mf["abs_rel"] < 0.6 * mr["abs_rel"], (mr, mf)
    assert mf["delta1"] > mr["delta1"] + 0.05, (mr, mf)
    assert mf["delta1"] > 0.85, mf


def test_probe_snapshot_transport_matches_worker(seq):
    """tri_d2h='probe': the deferred triangulation's vertex snapshot
    rides the caller's completion-probe pull instead of its own D2H
    (the sustained-streaming transport). Topology installed through the
    probe path must be identical to the worker-pull path."""
    params = _small_params()

    def drive(mode):
        eng = Flame(seq.cam.width, seq.cam.height, cam=seq.cam,
                    params=params, deferred_triangulation=True)
        eng.tri_d2h = mode
        for w in range(3):
            frames = [(seq.timestamps[i], i,
                       SE3(seq.poses.q[i], seq.poses.t[i]),
                       seq.images[i], i % 6 == 0)
                      for i in range(6 * w, 6 * w + 6)]
            assert eng.update_window(frames)
            if mode == "probe":
                p, tok = eng.completion_probe()
                eng.deliver_probe(tok, np.asarray(p))
        # Let in-flight jobs land, then force the final install.
        eng._apply_pending_triangulation(block=True)
        return eng

    a = drive("probe")
    b = drive("worker")
    np.testing.assert_array_equal(np.asarray(a.state.tris),
                                  np.asarray(b.state.tris))
    np.testing.assert_array_equal(np.asarray(a.state.tri_valid),
                                  np.asarray(b.state.tri_valid))
    np.testing.assert_array_equal(np.asarray(a.state.edges),
                                  np.asarray(b.state.edges))
    np.testing.assert_array_equal(np.asarray(a.state.topo_frame_id),
                                  np.asarray(b.state.topo_frame_id))
    assert a._tri_dropped == 0
    a.shutdown(); b.shutdown()

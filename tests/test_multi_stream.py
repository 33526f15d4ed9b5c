"""End-to-end multi-stream orchestrator tests (VERDICT r1 item 4).

The reference runs one nodelet per camera (flame_nodelet.cc:510-610);
MultiStreamRunner is the TPU-native N-stream scale-out: one vmapped
dispatch advances all streams through the FULL algorithm (epipolar
filtering, poseframe detection, host Delaunay, NLTGV2, raster)."""
import numpy as np
import jax
import pytest

from flame_ros_tpu.config import FlameParams
from flame_ros_tpu.datasets.synthetic import make_sequence, QVGA
from flame_ros_tpu.geometry.se3 import SE3
from flame_ros_tpu.models.engine import Flame
from flame_ros_tpu.parallel import multi_stream as ms


def _params():
    return FlameParams.from_dict({
        "engine": {"max_features": 512, "max_keyframes": 4,
                   "pd_iters_per_frame": 30},
        "input": {"poseframe_subsample_factor": 6},
    })


@pytest.fixture(scope="module")
def seq():
    return make_sequence(n_frames=14, cam=QVGA, motion="strafe")


def _frames(seq, i):
    return (seq.timestamps[i], i,
            SE3(np.asarray(seq.poses.q[i]), np.asarray(seq.poses.t[i])),
            seq.images[i])


def test_runner_end_to_end(seq):
    """Two streams through 13 frames (3 poseframe rounds): both produce
    dense, finite idepth with real coverage, meshes and stats."""
    runner = ms.MultiStreamRunner(seq.cam, num_streams=2, params=_params())
    for i in range(13):
        f = _frames(seq, i)
        # stream 1 runs one frame behind -> genuinely different state
        g = _frames(seq, max(i - 1, 0))
        assert runner.update([f, g])
    maps = runner.get_idepth_maps()
    assert maps.shape == (2, seq.cam.height, seq.cam.width)
    gt = 1.0 / np.maximum(seq.depths[12], 1e-6)
    m = np.isfinite(maps[0]) & (seq.depths[12] > 0)
    assert m.mean() > 0.4, f"coverage {m.mean()}"
    err = np.abs(maps[0] - gt)[m]
    assert np.median(err) < 0.05, f"median idepth err {np.median(err)}"
    stats = runner.flush_stats()
    assert len(stats) == 2 and stats[0]["coverage"] > 0.3
    meshes = runner.get_meshes()
    assert len(meshes) == 2
    for uv, x, tris in meshes:
        assert len(uv) >= 3 and len(tris) >= 1
        assert np.isfinite(x).all()


def test_runner_matches_single_engine(seq):
    """Stream 0 of the batched runner must track the single-stream engine
    closely on identical input (same schedule, same params)."""
    params = _params()
    runner = ms.MultiStreamRunner(seq.cam, num_streams=2, params=params)
    engine = Flame(seq.cam.width, seq.cam.height, cam=seq.cam,
                   params=params)
    for i in range(13):
        f = _frames(seq, i)
        runner.update([f, f])
        ok = engine.update(seq.timestamps[i], i,
                           SE3(seq.poses.q[i], seq.poses.t[i]),
                           seq.images[i], is_poseframe=(i % 6 == 0))
        assert ok
    got = runner.get_idepth_maps()[0]
    # Compare like-for-like: the runner exposes the IN-DISPATCH dense map
    # of the last frame (pre-topology-install), so pull the engine's
    # in-dispatch product rather than the fresh-state getter (which
    # rasterizes with the just-installed topology).
    from flame_ros_tpu.ops.raster import idepth_from_ids
    want = np.asarray(idepth_from_ids(engine.state.last_idmap,
                                      engine.state.last_planes))
    m = np.isfinite(got) & np.isfinite(want)
    assert m.mean() > 0.4
    # Same math modulo triangulation-order ties: dense maps agree.
    diff = np.abs(got - want)[m]
    assert np.median(diff) < 1e-3, f"median map diff {np.median(diff)}"


def test_runner_sharded_on_mesh(seq):
    """Stream-dp over the 8-device CPU mesh: sharded run equals the
    unsharded run."""
    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device mesh")
    params = _params()
    mesh = ms.make_mesh(jax.devices()[:2], stream_axis=2)
    sharded = ms.MultiStreamRunner(seq.cam, num_streams=2, params=params,
                                   mesh=mesh)
    plain = ms.MultiStreamRunner(seq.cam, num_streams=2, params=params)
    for i in range(8):
        f = _frames(seq, i)
        g = _frames(seq, max(i - 1, 0))
        sharded.update([f, g])
        plain.update([f, g])
    a = sharded.get_idepth_maps()
    b = plain.get_idepth_maps()
    m = np.isfinite(a) & np.isfinite(b)
    assert m.mean() > 0.3
    np.testing.assert_allclose(a[m], b[m], atol=1e-4)


def test_runner_masks_stale_topology_in_meshes(seq):
    """VERDICT r2 item 6: a vertex slot re-detected AFTER the topology
    install is a different feature at an unrelated pixel; triangles
    referencing it must be masked out of get_meshes (same watermark rule
    as the single-stream getters, Flame._tri_fresh)."""
    import jax.numpy as jnp
    runner = ms.MultiStreamRunner(seq.cam, num_streams=2, params=_params())
    for i in range(13):
        f = _frames(seq, i)
        runner.update([f, f])
    st = runner.states
    tvb = np.asarray(st.tri_valid)
    assert tvb[0].any()
    # Simulate post-install re-detection on stream 0: stamp one corner of
    # the first valid triangle with a frame id past the watermark (this is
    # exactly what the detection stage does when it recycles the slot).
    tri0 = int(np.flatnonzero(tvb[0])[0])
    slot = int(np.asarray(st.tris)[0, tri0, 0])
    wm = int(np.asarray(st.topo_frame_id)[0])
    fid = st.feat.frame_id.at[0, slot].set(wm + 1)
    runner.states = st._replace(feat=st.feat._replace(frame_id=fid))
    n_valid0 = int(tvb[0].sum())
    meshes = runner.get_meshes()
    # Every triangle touching the recycled slot is masked on stream 0...
    tris0 = np.asarray(st.tris)[0]
    n_ghost = int((tvb[0] & (tris0 == slot).any(-1)).sum())
    assert n_ghost >= 1
    assert len(meshes[0][2]) == n_valid0 - n_ghost
    # ...and stream 1 is untouched.
    assert len(meshes[1][2]) == int(tvb[1].sum())
    for t in meshes[0][2]:
        assert slot not in t


def test_runner_deferred_triangulation(seq):
    """Deferred mode: host Delaunay overlaps the next frame's dispatch;
    topology installs one frame late but the run stays accurate."""
    runner = ms.MultiStreamRunner(seq.cam, num_streams=2, params=_params(),
                                  deferred_triangulation=True)
    for i in range(13):
        f = _frames(seq, i)
        assert runner.update([f, f])
    maps = runner.get_idepth_maps()
    gt = 1.0 / np.maximum(seq.depths[12], 1e-6)
    m = np.isfinite(maps[0]) & (seq.depths[12] > 0)
    assert m.mean() > 0.4
    assert np.median(np.abs(maps[0] - gt)[m]) < 0.05
    for uv, x, tris in runner.get_meshes():
        assert len(tris) >= 1


def test_get_meshes_bit_exact_past_f32_ceiling(seq):
    """Integer fields travel the packed get_meshes D2H as bit patterns:
    frame ids and the watermark above 2^24 (where f32 casts stop
    round-tripping) must still gate triangles exactly."""
    import jax.numpy as jnp
    runner = ms.MultiStreamRunner(seq.cam, num_streams=2, params=_params())
    for i in range(13):
        f = _frames(seq, i)
        runner.update([f, f])
    st = runner.states
    tvb = np.asarray(st.tri_valid)
    assert tvb[0].any()
    # Long-lived-stream ids: watermark at 2^24 + 5 (NOT f32-exact), one
    # recycled slot exactly one past it, all other slots exactly at it.
    big = 2 ** 24 + 5
    tri0 = int(np.flatnonzero(tvb[0])[0])
    slot = int(np.asarray(st.tris)[0, tri0, 0])
    fid = np.full(st.feat.frame_id.shape, big, np.int32)
    fid[0, slot] = big + 1  # would alias to big under an f32 cast
    runner.states = st._replace(
        feat=st.feat._replace(frame_id=jnp.asarray(fid)),
        topo_frame_id=jnp.full_like(st.topo_frame_id, big))
    meshes = runner.get_meshes()
    tris0 = np.asarray(st.tris)[0]
    n_ghost = int((tvb[0] & (tris0 == slot).any(-1)).sum())
    assert n_ghost >= 1
    # f32 transport would round big+1 down to big and KEEP the ghosts.
    assert len(meshes[0][2]) == int(tvb[0].sum()) - n_ghost
    for t in meshes[0][2]:
        assert slot not in t


def test_runner_spatial_partition_matches_plain(seq):
    """The PRODUCT engine step with the spatially sharded NLTGV2 sweep
    (engine.spatial_parts=2 on a ('stream','part') mesh — VERDICT r3
    item 2) vs the identical runner with the unsharded sweep: the halo-
    exchange sweep is the same arithmetic in the same reduction order,
    so dense maps, graph primals, duals, and stats must agree to
    compiler-fusion tolerance after 13 frames / 3 topology installs."""
    import dataclasses as dc
    params = _params()
    sp_params = dc.replace(
        params, engine=dc.replace(params.engine, spatial_parts=2))
    mesh = ms.make_mesh(jax.devices()[:4], parts=2)
    spatial = ms.MultiStreamRunner(seq.cam, num_streams=2,
                                   params=sp_params, mesh=mesh)
    plain = ms.MultiStreamRunner(seq.cam, num_streams=2, params=params)
    for i in range(13):
        f = _frames(seq, i)
        g = _frames(seq, max(i - 1, 0))
        assert spatial.update([f, g])
        assert plain.update([f, g])
    assert spatial.parts is not None, "partition never installed"
    # The batched sweep rebuilds edge geometry from current uv each
    # frame — the install must NOT ship the install-time dp/alpha/beta
    # (three dead H2D transfers per install on a transfer-count-bound
    # link, round-4 review fix).
    assert spatial.parts.dp is None
    assert spatial.parts.alpha is None
    assert spatial.parts.beta is None
    ms_a = spatial.get_idepth_maps()
    ms_b = plain.get_idepth_maps()
    both = np.isfinite(ms_a) & np.isfinite(ms_b)
    assert (np.isfinite(ms_a) == np.isfinite(ms_b)).mean() > 0.999
    assert np.abs(ms_a - ms_b)[both].max() < 1e-4
    xa = np.asarray(spatial.states.vtx_x)
    xb = np.asarray(plain.states.vtx_x)
    ga = np.asarray(spatial.states.vtx_in_graph)
    gb = np.asarray(plain.states.vtx_in_graph)
    np.testing.assert_array_equal(ga, gb)
    np.testing.assert_allclose(xa[ga], xb[gb], atol=1e-5)
    qa = np.asarray(spatial.states.edge_q)
    qb = np.asarray(plain.states.edge_q)
    ea = np.asarray(spatial.states.edge_valid)
    np.testing.assert_allclose(qa[ea], qb[ea], atol=1e-5)
    sa = spatial.flush_stats()
    sb = plain.flush_stats()
    for k in ("coverage", "num_tris", "nltgv2_total_data_cost"):
        np.testing.assert_allclose(sa[0][k], sb[0][k], rtol=1e-3, atol=1e-3)


def test_runner_spatial_requires_part_mesh(seq):
    import dataclasses as dc
    params = _params()
    sp_params = dc.replace(
        params, engine=dc.replace(params.engine, spatial_parts=2))
    with pytest.raises(ValueError, match="part"):
        ms.MultiStreamRunner(seq.cam, num_streams=2, params=sp_params)


def test_make_mesh_auto_selection_rule():
    """The recorded spatial-vs-dp selection rule (VERDICT r4 weak #3,
    re-measured round 5): pure stream-dp for EVERY stream count —
    after the round-5 engine speedups no parts>1 combination measures
    profitable on this host (make_mesh docstring has the cross-round
    table); spatial stays an explicit opt-in. Unused devices stay off
    the mesh."""
    import jax

    devs = jax.devices()
    assert len(devs) >= 8

    # S=1 -> plain single-device stream mesh (round 5 re-measure:
    # the r4 single-stream spatial win did not reproduce after the
    # engine speedups — every parts>1 combo now measures
    # neutral-to-negative on this host; see make_mesh docstring).
    m = ms.make_mesh(devs, auto_for_streams=1)
    assert m.axis_names == ("stream", "feat")
    assert m.shape == {"stream": 1, "feat": 1}

    # S=4 over 8 devices -> pure stream-dp over gcd(4, 8) = 4 devices,
    # NOT a ("stream", "part") mesh.
    m = ms.make_mesh(devs, auto_for_streams=4)
    assert m.axis_names == ("stream", "feat")
    assert m.shape == {"stream": 4, "feat": 1}

    # S=3 over 8 devices -> largest dp split that divides the batch.
    m = ms.make_mesh(devs, auto_for_streams=3)
    assert m.shape == {"stream": 1, "feat": 1}

    # S=8 over 8 devices -> full dp.
    m = ms.make_mesh(devs, auto_for_streams=8)
    assert m.shape == {"stream": 8, "feat": 1}


def test_runner_mesh_auto(seq):
    """mesh='auto' wires the recorded selection rule into the runner
    itself (VERDICT r4 weak #3 at product depth): S=4 over 8 devices
    resolves to pure stream-dp over 4 devices; S=3 (no dp split beyond
    1 divides the batch) drops to the plain no-mesh path; a non-'auto'
    string is rejected."""
    import jax

    assert len(jax.devices()) >= 8
    r = ms.MultiStreamRunner(seq.cam, num_streams=4, params=_params(),
                             mesh="auto")
    assert r.mesh is not None
    assert r.mesh.axis_names == ("stream", "feat")
    assert r.mesh.shape == {"stream": 4, "feat": 1}
    assert not r.spatial
    assert r.update([_frames(seq, 0)] * 4)
    r.shutdown()

    r1 = ms.MultiStreamRunner(seq.cam, num_streams=3, params=_params(),
                              mesh="auto")
    assert r1.mesh is None  # 1-device outcome -> plain path
    r1.shutdown()

    with pytest.raises(ValueError, match="auto"):
        ms.MultiStreamRunner(seq.cam, num_streams=2, params=_params(),
                             mesh="automatic")


def test_runner_warns_on_unprofitable_spatial_combo(seq):
    """Multi-stream + spatial parts (the recorded s2p2 negative) must
    not configure silently."""
    import dataclasses
    import warnings

    import jax

    from flame_ros_tpu.config import FlameParams

    base = FlameParams()
    eng = dataclasses.replace(base.engine, spatial_parts=2,
                              max_features=128)
    params = dataclasses.replace(base, engine=eng)
    mesh = ms.make_mesh(jax.devices()[:4], parts=2)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        r = ms.MultiStreamRunner(seq.cam, 2, params=params, mesh=mesh)
        r.shutdown()
    assert any("measured-unprofitable" in str(x.message) for x in w), \
        [str(x.message) for x in w]


def test_runner_checkpoint_roundtrip_bit_identical(seq, tmp_path):
    """SURVEY §5.4 / VERDICT r4 missing #2: save mid-run, restore into a
    FRESH runner, replay the identical remaining frames — the restored
    run's final dense maps and graph state must be BIT-identical to the
    uninterrupted run's (dispatches are deterministic; the checkpoint
    must capture every bit that matters)."""
    def drive(runner, lo, hi):
        for i in range(lo, hi):
            runner.update([_frames(seq, i), _frames(seq, max(i - 1, 0))])

    a = ms.MultiStreamRunner(seq.cam, num_streams=2, params=_params())
    drive(a, 0, 8)
    fn = a.save_checkpoint(str(tmp_path / "ms_ckpt"))
    drive(a, 8, 13)
    maps_a = a.get_idepth_maps()
    state_a = jax.tree.flatten(a.states)[0]
    a.shutdown()

    b = ms.MultiStreamRunner(seq.cam, num_streams=2, params=_params())
    b.load_checkpoint(fn)
    drive(b, 8, 13)
    maps_b = b.get_idepth_maps()
    state_b = jax.tree.flatten(b.states)[0]
    b.shutdown()

    np.testing.assert_array_equal(np.asarray(maps_a), np.asarray(maps_b))
    for xa, xb in zip(state_a, state_b):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))


def test_runner_checkpoint_capacity_mismatch_rejected(seq, tmp_path):
    a = ms.MultiStreamRunner(seq.cam, num_streams=2, params=_params())
    a.update([_frames(seq, 0), _frames(seq, 0)])
    fn = a.save_checkpoint(str(tmp_path / "cap_ckpt"))
    a.shutdown()
    import dataclasses
    p = _params()
    p = dataclasses.replace(
        p, engine=dataclasses.replace(p.engine, max_features=256))
    b = ms.MultiStreamRunner(seq.cam, num_streams=2, params=p)
    with pytest.raises(ValueError, match="capacities"):
        b.load_checkpoint(fn)
    b.shutdown()


def test_runner_checkpoint_publish_is_atomic(seq, tmp_path):
    """The shard file must appear only as a COMPLETE npz (temp-write +
    os.replace): a pod watcher polling for the file — the kill/restart
    harness does exactly this — must never load a half-written archive,
    and a re-save over an existing checkpoint must replace it cleanly."""
    import os

    a = ms.MultiStreamRunner(seq.cam, num_streams=2, params=_params())
    a.update([_frames(seq, 0), _frames(seq, 0)])
    fn = a.save_checkpoint(str(tmp_path / "atomic_ckpt"))
    assert os.path.exists(fn)
    assert not os.path.exists(fn + ".tmp"), "temp file leaked"
    # Re-save over the same path (os.replace over an existing file).
    a.update([_frames(seq, 1), _frames(seq, 1)])
    fn2 = a.save_checkpoint(str(tmp_path / "atomic_ckpt"))
    assert fn2 == fn and os.path.getsize(fn) > 0
    assert not os.path.exists(fn + ".tmp")
    a.shutdown()
    # The published file is a complete, loadable archive both times.
    b = ms.MultiStreamRunner(seq.cam, num_streams=2, params=_params())
    b.load_checkpoint(fn)
    b.shutdown()

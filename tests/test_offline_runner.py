import json
import os

import numpy as np

from flame_ros_tpu.frontends.offline_runner import main


def test_runner_synthetic_end_to_end(tmp_path, capsys):
    """The product surface: CLI run over synthetic with GT evaluation."""
    res = main(["--dataset", "synthetic", "--frames", "14",
                "--out", str(tmp_path), "--save-products"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    summary = json.loads(out)
    assert summary["frames"] == 14
    assert summary["failed"] == 0
    assert summary["idepth_rmse"] is not None
    assert summary["idepth_rmse"] < 0.1
    assert summary["coverage"] > 0.4
    # Standard monodepth metrics (final frame, meters).
    assert 0.0 < summary["abs_rel"] < 0.25
    assert summary["delta1"] > 0.6

    # Reference-protocol artifacts exist and parse.
    from flame_ros_tpu.eval.metrics import load_stats_file
    stats = load_stats_file(str(tmp_path / "stats.txt"))
    assert len(stats["idx"]) == 14
    assert (stats["precision"][-5:] > 0.5).all()

    telemetry = [json.loads(l) for l in
                 open(tmp_path / "telemetry.jsonl")]
    assert len(telemetry) == 14
    assert "update_ms" in telemetry[0]
    assert "num_fail_max_cost" in telemetry[0]

    mesh = np.load(tmp_path / "final_mesh.npz")
    assert mesh["triangles"].shape[1] == 3
    assert np.isfinite(np.load(tmp_path / "final_idepth.npy")).any()


def test_runner_windowed(tmp_path, capsys):
    """--window N: batched dispatch path with device-side GT eval."""
    res = main(["--dataset", "synthetic", "--frames", "18",
                "--out", str(tmp_path), "--window", "6"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    summary = json.loads(out)
    assert summary["frames"] == 18
    assert summary["idepth_rmse"] is not None
    assert summary["idepth_rmse"] < 0.15
    from flame_ros_tpu.eval.metrics import load_stats_file
    stats = load_stats_file(str(tmp_path / "stats.txt"))
    # First window has no dense map yet (GT block=-1 rows are skipped);
    # remaining frames all present.
    assert len(stats["idx"]) >= 12
    telemetry = [json.loads(l) for l in open(tmp_path / "telemetry.jsonl")]
    assert len(telemetry) == 18


def test_runner_tracking_mode(tmp_path, capsys):
    """--pose-source tracking (BASELINE config 4 path through the
    runner): poses estimated online, input GT poses consumed only by the
    ATE block; depth metrics + stats.txt flow as in external mode."""
    # NOTE: the synthetic trajectory spans the full loop regardless of
    # frame count, so fewer frames = larger inter-frame baselines; 40
    # keeps per-frame motion in the tracker's designed regime.
    main(["--dataset", "synthetic", "--frames", "40",
          "--pose-source", "tracking", "--out", str(tmp_path)])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    summary = json.loads(out)
    assert summary["frames"] == 40
    assert summary["failed"] == 0
    # Trajectory: Horn-aligned ATE well under 1% of the GT path.
    assert summary["ate_rmse"] is not None
    assert summary["gt_path_length"] > 1.0
    assert summary["ate_rmse"] < 0.01 * summary["gt_path_length"], summary
    assert summary["ate_rmse_sim3"] <= summary["ate_rmse"] + 1e-6
    # RPE (TUM evaluate_rpe) rides the same block: per-frame drift must
    # be small on the easy regime; delta=30 needs >30 poses so it is
    # present here (40 frames) and larger than the per-frame row.
    assert summary["rpe_trans_rmse"] is not None
    assert summary["rpe_trans_rmse"] < 0.02, summary
    assert summary["rpe_rot_rmse_deg"] < 0.5, summary
    assert summary["rpe30_trans_rmse"] is not None
    # Depth metrics still flow (estimated poses, so looser than external).
    assert summary["idepth_rmse"] is not None
    assert summary["idepth_rmse"] < 0.12
    from flame_ros_tpu.eval.metrics import load_stats_file
    stats = load_stats_file(str(tmp_path / "stats.txt"))
    assert len(stats["idx"]) >= 30
    telemetry = [json.loads(l) for l in open(tmp_path / "telemetry.jsonl")]
    assert len(telemetry) == 40


def test_runner_window_flag_conflicts(tmp_path, capsys):
    import pytest
    with pytest.raises(SystemExit):
        main(["--dataset", "synthetic", "--frames", "6",
              "--window", "6", "--pass-in-truth"])


def test_runner_subsample(tmp_path, capsys):
    main(["--dataset", "synthetic", "--frames", "12",
          "--out", str(tmp_path), "--config", _cfg(tmp_path)])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(out)["frames"] == 6  # subsample 2


def _cfg(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text("input:\n  subsample_factor: 2\n")
    return str(p)


def test_runner_tum_dataset(tmp_path, rng, capsys):
    """End-to-end through the TUM frontend on a synthetic-backed tree:
    render posed frames, export them as a TUM dataset (export_tum:
    assoc.txt + calib.yaml + rgb/depth PNGs), run the CLI, check GT
    metrics come back sane."""
    from flame_ros_tpu.datasets.synthetic import (export_tum,
                                                  make_sequence, QVGA)
    seq = make_sequence(n_frames=8, cam=QVGA)
    assoc, calib = export_tum(seq, str(tmp_path / "tum"))
    out = tmp_path / "out"
    main(["--dataset", "tum", "--input", assoc,
          "--calib", calib, "--out", str(out)])
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["frames"] == 8
    assert summary["idepth_rmse"] is not None
    assert summary["idepth_rmse"] < 0.2
    assert (out / "stats.txt").exists()


def test_pose_noise_ablation(tmp_path, capsys):
    """--pose-noise-sigma: the pose-corruption harness the reference
    keeps in src/flame_offline_tum.cc:438-489, promoted to a runner
    mode. Noise must measurably degrade accuracy (the ablation has
    signal) while the run itself stays healthy (graceful degradation)."""
    main(["--dataset", "synthetic", "--frames", "14",
          "--out", str(tmp_path / "clean")])
    clean = json.loads(
        capsys.readouterr().out.strip().splitlines()[-1])
    main(["--dataset", "synthetic", "--frames", "14",
          "--out", str(tmp_path / "noisy"),
          "--pose-noise-sigma", "0.01",
          "--pose-noise-rot-sigma", "0.5",
          "--pose-noise-seed", "3"])
    noisy = json.loads(
        capsys.readouterr().out.strip().splitlines()[-1])
    assert noisy["frames"] == 14
    assert noisy["idepth_rmse"] > clean["idepth_rmse"]
    assert noisy["coverage"] > 0.3
    assert noisy["idepth_rmse"] < 10 * max(clean["idepth_rmse"], 0.01)


def test_asl_pipeline_end_to_end_synthetic(tmp_path, capsys):
    """BASELINE config 3 PIPELINE at small scale: export a synthetic
    6-DoF MAV sequence as a EuRoC/ASL folder tree, then drive the full
    ASL frontend over it (folder reader -> association -> T_BS chain ->
    rectification -> engine -> GT stats). Closes 'ASL loader is
    fixture-tested only' — this is the complete dataset->metrics path
    the reference's flame_offline_asl runs on downloaded EuRoC."""
    from flame_ros_tpu.datasets.synthetic import (export_asl,
                                                  make_sequence, QVGA)
    seq = make_sequence(n_frames=30, cam=QVGA, motion="mav")
    root = tmp_path / "mav0"
    export_asl(seq, str(root))
    main(["--dataset", "asl",
          "--pose-path", str(root / "state_groundtruth_estimate0"),
          "--rgb-path", str(root / "cam0"),
          "--depth-path", str(root / "depth0"),
          "--world-frame", "RDF",
          "--out", str(tmp_path / "out")])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    summary = json.loads(out)
    assert summary["frames"] == 30
    assert summary["failed"] == 0
    assert summary["idepth_rmse"] is not None
    assert summary["idepth_rmse"] < 0.12, summary
    assert summary["recall"] > 0.4, summary
    from flame_ros_tpu.eval.metrics import load_stats_file
    stats = load_stats_file(str(tmp_path / "out" / "stats.txt"))
    assert len(stats["idx"]) == 30

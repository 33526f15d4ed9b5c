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


def test_runner_subsample(tmp_path, capsys):
    main(["--dataset", "synthetic", "--frames", "12",
          "--out", str(tmp_path), "--config", _cfg(tmp_path)])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(out)["frames"] == 6  # subsample 2


def _cfg(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text("input:\n  subsample_factor: 2\n")
    return str(p)

"""Acceptance run at realistic scale (VERDICT r1 item 2).

The reference's de-facto verification is a golden-dataset run with GT
metrics (reference scripts/Dockerfile:46-52 + src/flame_offline_tum.cc:
320-398). Real TUM/EuRoC data cannot be downloaded here (zero egress;
scripts/get_tum.sh / get_euroc.sh are the one-command path wherever
egress exists), so the committed acceptance gate runs the same protocol
on the synthetic GT scene at FULL defaults: VGA, 200 frames, no loosened
parameters. Recorded numbers live in PARITY.md §acceptance.

Run with: pytest -m acceptance (excluded from the default suite: ~7 min
of pure CPU compute).
"""
import json

import pytest

from flame_ros_tpu.frontends.offline_runner import main


@pytest.mark.acceptance
def test_vga_200_frames_full_defaults(tmp_path, capsys):
    main(["--dataset", "synthetic", "--resolution", "vga",
          "--frames", "200", "--out", str(tmp_path)])
    s = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # Hard gates, set ~30-60% above the recorded run (PARITY.md):
    # rmse 0.0294 / precision 1.0 / recall 0.892 / coverage 0.935.
    assert s["failed"] == 0
    assert s["frames"] == 200
    assert s["idepth_rmse"] < 0.05, s
    assert s["precision"] > 0.95, s
    assert s["recall"] > 0.80, s
    assert s["coverage"] > 0.85, s

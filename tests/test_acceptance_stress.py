"""Hard-regime acceptance matrix (VERDICT r2 item 1).

Real TUM/EuRoC sequences cannot be downloaded here (zero egress;
scripts/get_tum.sh / get_euroc.sh are the one-command path wherever
egress exists), so the BASELINE "TUM low-texture stress" config class is
covered by the hardest synthesizable regimes, each run at FULL product
defaults (VGA, 200 frames, no loosened parameters — same protocol as
tests/test_acceptance.py / reference src/flame_offline_tum.cc:320-398):

- rotation: yaw-pan trajectory with ~6 cm baselines (in-plane epipoles).
  This regime caught a real product bug in round 3: the epipolar tap
  direction degenerated when the baseline had no z component
  (ops/epipolar.py) — RMSE was 0.33 before the fix, 0.029 after.
- low_texture: contrast scaled to 0.3 (7% of pixels above the detection
  gradient floor).
- exposure: auto-exposure oscillation (gain ±0.5, bias ±15 gray), run
  BOTH ways as a zero_mean_ssd A/B — the invariant matcher must beat
  plain SSD decisively on every accuracy metric.

Recorded full-run numbers live in PARITY.md §stress-acceptance.

Run with: pytest -m acceptance (nightly CI; ~25 min of CPU compute).
"""
import json

import pytest

from flame_ros_tpu.frontends.offline_runner import main


def _run(capsys, *extra):
    main(["--dataset", "synthetic", "--resolution", "vga",
          "--frames", "200", *extra])
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


@pytest.mark.acceptance
def test_rotation_stress_vga200(capsys):
    s = _run(capsys, "--motion", "rotation")
    # Recorded (PARITY.md): rmse 0.0291, recall 0.805, coverage 0.881.
    assert s["failed"] == 0 and s["frames"] == 200
    assert s["idepth_rmse"] < 0.05, s
    assert s["precision"] > 0.95, s
    assert s["recall"] > 0.70, s
    assert s["coverage"] > 0.80, s


@pytest.mark.acceptance
def test_low_texture_stress_vga200(capsys):
    s = _run(capsys, "--texture-gain", "0.3")
    # Recorded (PARITY.md): rmse 0.0286, recall 0.885, coverage 0.929.
    assert s["failed"] == 0 and s["frames"] == 200
    assert s["idepth_rmse"] < 0.05, s
    assert s["precision"] > 0.95, s
    assert s["recall"] > 0.80, s
    assert s["coverage"] > 0.85, s


@pytest.mark.acceptance
def test_rotation_low_texture_stress_vga200(capsys):
    """The hardest synthesizable combination: in-plane epipoles (yaw pan,
    ~6 cm baselines) AND sparse gradients (contrast 0.3) at once."""
    s = _run(capsys, "--motion", "rotation", "--texture-gain", "0.3")
    # Recorded (PARITY.md): rmse 0.0365, recall 0.809, coverage 0.852,
    # delta1 0.942 (2026-08-19).
    assert s["failed"] == 0 and s["frames"] == 200
    assert s["idepth_rmse"] < 0.05, s
    assert s["precision"] > 0.95, s
    assert s["recall"] > 0.70, s
    assert s["coverage"] > 0.80, s


@pytest.mark.acceptance
def test_exposure_stress_zero_mean_ssd_ab(capsys):
    """A/B on the exposure-oscillation regime: zero_mean_ssd must pass
    hard gates AND beat plain SSD on rmse, recall, and abs_rel."""
    a = _run(capsys, "--exposure-amp", "0.5")
    b = _run(capsys, "--exposure-amp", "0.5", "--zero-mean-ssd")
    assert b["failed"] == 0 and b["frames"] == 200
    # Hard gates on the B (product-recommended) configuration.
    assert b["idepth_rmse"] < 0.07, b
    assert b["precision"] > 0.95, b
    assert b["recall"] > 0.70, b
    assert b["coverage"] > 0.80, b
    # The A/B: invariant matching strictly better under exposure churn.
    assert b["idepth_rmse"] < a["idepth_rmse"], (a, b)
    assert b["recall"] > a["recall"], (a, b)
    assert b["abs_rel"] < a["abs_rel"], (a, b)


@pytest.mark.acceptance
def test_mav_motion_vga200(capsys):
    """BASELINE config 3 stand-in (EuRoC V1 MAV motion): all six DoF
    excited at once — roll/pitch oscillation + forward excursion +
    vertical bob + yaw pan. Recorded (PARITY.md): rmse 0.0364, recall
    0.774, coverage 0.876, delta1 0.973 (2026-08-20, CPU backend)."""
    s = _run(capsys, "--motion", "mav")
    assert s["failed"] == 0 and s["frames"] == 200
    assert s["idepth_rmse"] < 0.06, s
    assert s["precision"] > 0.95, s
    assert s["recall"] > 0.70, s
    assert s["coverage"] > 0.80, s
    assert s["delta1"] > 0.85, s


@pytest.mark.acceptance
def test_primitives_scene_vga200(capsys):
    """Second, independent scene family (occluding boxes + spheres —
    real depth discontinuities; de-correlates the acceptance numbers
    from the room generator). Raw-map gates; the display filters'
    decisive improvement at the occlusion boundaries is gated
    separately in test_engine.py. Recorded (PARITY.md): rmse 0.0566,
    recall 0.881, coverage 0.944, abs_rel 0.063 (2026-08-20, CPU
    backend)."""
    s = _run(capsys, "--scene", "primitives")
    assert s["failed"] == 0 and s["frames"] == 200
    assert s["idepth_rmse"] < 0.08, s
    assert s["precision"] > 0.95, s
    assert s["recall"] > 0.80, s
    assert s["coverage"] > 0.88, s
    assert s["abs_rel"] < 0.15, s


@pytest.mark.acceptance
def test_tum_pipeline_vga200(tmp_path, capsys):
    """BASELINE config 1 at acceptance scale THROUGH THE TUM PIPELINE:
    the synthetic sequence exported as a TUM RGB-D tree and run via
    --dataset tum (association-file parser, P-matrix calibration,
    plumb-bob rectification, uint16/5000 depth scaling), not fed
    directly — the full dataset->metrics path the reference's
    flame_offline_tum runs on downloaded fr3 sequences."""
    from flame_ros_tpu.datasets.synthetic import (export_tum,
                                                  make_sequence, VGA)
    seq = make_sequence(n_frames=200, cam=VGA)
    assoc, calib = export_tum(seq, str(tmp_path / "tum"))
    del seq
    main(["--dataset", "tum", "--input", assoc, "--calib", calib])
    s = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s["frames"] == 200 and s["failed"] == 0
    # Same gates as the direct-feed easy regime (tests/test_acceptance):
    # the pipeline (PNG quantization, uint16 depth, text poses) must
    # not move the metrics materially.
    assert s["idepth_rmse"] < 0.05, s
    assert s["precision"] > 0.95, s
    assert s["recall"] > 0.80, s
    assert s["coverage"] > 0.85, s


@pytest.mark.acceptance
def test_asl_pipeline_mav_vga200(tmp_path, capsys):
    """BASELINE config 3 at acceptance scale THROUGH THE ASL PIPELINE:
    the synthetic MAV sequence exported as a EuRoC folder tree and run
    via --dataset asl (folder reader, association, T_BS chain,
    conversion), not fed directly — the full dataset->metrics path the
    reference's flame_offline_asl runs on downloaded EuRoC."""
    from flame_ros_tpu.datasets.synthetic import (export_asl,
                                                  make_sequence, VGA)
    seq = make_sequence(n_frames=200, cam=VGA, motion="mav")
    root = tmp_path / "mav0"
    export_asl(seq, str(root))
    del seq
    main(["--dataset", "asl",
          "--pose-path", str(root / "state_groundtruth_estimate0"),
          "--rgb-path", str(root / "cam0"),
          "--depth-path", str(root / "depth0"),
          "--world-frame", "RDF"])
    s = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s["frames"] == 200 and s["failed"] == 0
    # Same gates as the direct-feed MAV regime (PARITY round-4 matrix):
    # the pipeline (PNG quantization, uint16 depth, CSV poses) must not
    # move the metrics materially.
    assert s["idepth_rmse"] < 0.06, s
    assert s["precision"] > 0.95, s
    assert s["recall"] > 0.70, s
    assert s["coverage"] > 0.80, s

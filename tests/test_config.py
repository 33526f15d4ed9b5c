import pytest

from flame_ros_tpu.config import FlameParams


def test_defaults_match_reference_yaml():
    """Defaults mirror reference cfg/flame_nodelet.yaml values."""
    p = FlameParams()
    assert p.features.detection.win_size == 16
    assert p.features.detection.min_grad_mag == 5.0
    assert p.features.tracking.max_dropouts == 5
    assert p.regularization.nltgv2.data_factor == 0.15
    assert p.regularization.nltgv2.step_q == 125.0
    # theta deviates from the reference default deliberately: preconditioned
    # primal-dual wants theta=1 (see Nltgv2Params).
    assert p.regularization.nltgv2.theta == 1.0
    assert p.input.poseframe_subsample_factor == 6
    assert p.output.load_integration_factor == 15
    assert p.output.edge_length_thresh == 0.333


def test_from_dict_nested_override():
    p = FlameParams.from_dict({
        "features": {"detection": {"win_size": 8}},
        "regularization": {"nltgv2": {"data_factor": 0.25}},
    })
    assert p.features.detection.win_size == 8
    assert p.regularization.nltgv2.data_factor == 0.25
    # Untouched defaults survive.
    assert p.features.tracking.win_size == 5


def test_unknown_key_fails_fast():
    with pytest.raises(KeyError):
        FlameParams.from_dict({"features": {"detektion": {}}})


def test_from_yaml_reference_file(tmp_path):
    """Load a reference-style YAML subset."""
    y = tmp_path / "cfg.yaml"
    y.write_text(
        "input:\n  subsample_factor: 2\n"
        "threading:\n  openmp:\n    num_threads: 4\n"
        "features:\n  detection:\n    min_grad_mag: 7.0\n")
    p = FlameParams.from_yaml(str(y))
    assert p.input.subsample_factor == 2
    assert p.features.detection.min_grad_mag == 7.0


def test_engine_capacities():
    p = FlameParams()
    assert p.engine.max_edges == 3 * p.engine.max_features
    assert p.engine.max_triangles == 2 * p.engine.max_features

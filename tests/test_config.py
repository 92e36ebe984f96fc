"""Config-system tests: parameter-tree fidelity with the reference YAML
format (config/NodeMapping.yaml, NodeMapping.cpp:52-65) including the keys
round 1 dropped (pyramid scales, visible_map.max_translation,
odometry.include_key_frame, log show flags)."""

import os

import pytest

pytestmark = pytest.mark.quick  # <5-min iteration tier (see pyproject)

from vslam_tpu.config import PipelineConfig, load_yaml_config

REF_YAML = "/root/reference/config/NodeMapping.yaml"


def test_defaults_match_reference_canonical_values():
    cfg = PipelineConfig()
    assert cfg.features_min_gradient == 30.0
    assert cfg.pyramid_scales == (1.0, 0.5, 0.25)
    assert cfg.pyramid_levels == 3
    assert cfg.solver_max_iterations == 100
    assert cfg.solver_min_step_size == 1e-11
    assert cfg.loss_function == "None"
    assert cfg.prediction_model == "ConstantMotion"
    assert cfg.keyframe_selection_idx_period == 5


def test_pyramid_scales_must_be_dyadic():
    with pytest.raises(ValueError):
        PipelineConfig(pyramid_scales=(1.0, 0.7))
    with pytest.raises(ValueError):
        PipelineConfig(pyramid_scales=())
    assert PipelineConfig(pyramid_scales=(1.0, 0.5)).pyramid_levels == 2
    # order-insensitive (coarse-first lists load fine)
    assert PipelineConfig(pyramid_scales=(0.25, 0.5, 1.0)).pyramid_levels == 3


@pytest.mark.skipif(not os.path.exists(REF_YAML), reason="reference not present")
def test_loads_reference_node_mapping_yaml_verbatim():
    """The reference's actual shipped YAML must load without translation."""
    cfg = load_yaml_config(REF_YAML)
    assert cfg.features_min_gradient == 30.0
    assert cfg.pyramid_scales == (1.0, 0.5, 0.25)
    assert cfg.solver_max_iterations == 100
    assert cfg.solver_min_step_size == pytest.approx(1e-11)
    assert cfg.loss_function == "None"
    assert cfg.prediction_model == "ConstantMotion"
    assert cfg.keyframe_selection_method == "idx"
    assert cfg.keyframe_selection_idx_period == 5
    # all show flags are false in the reference file -> no sinks enabled
    assert cfg.log_image_enabled == ()
    assert cfg.log_plot_enabled == ()


def test_loads_shipped_configs():
    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    full = load_yaml_config(os.path.join(root, "node_mapping.yaml"))
    assert full.enable_mapping is True
    assert full.include_key_frame is True
    assert full.keyframe_selection_max_translation == 0.2
    odo = load_yaml_config(os.path.join(root, "node_rgbd_alignment.yaml"))
    assert odo.enable_mapping is False


def test_extended_keys_round_trip(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text(
        """
pyramid:
  levels: [1.0, 0.5]
keyframe_selection:
  method: visible_map
  visible_map:
    min_visible_points: 33
    max_translation: 0.55
odometry:
  include_key_frame: false
  track_key_frame: true
  include_prior: false
log:
  image:
    Residual:
      show: true
  plot:
    SolverGN:
      show: true
"""
    )
    cfg = load_yaml_config(str(p))
    assert cfg.pyramid_scales == (1.0, 0.5)
    assert cfg.keyframe_selection_method == "visible_map"
    assert cfg.keyframe_selection_min_visible_points == 33
    assert cfg.keyframe_selection_max_translation == 0.55
    assert cfg.include_key_frame is False
    assert cfg.track_key_frame is True
    assert cfg.include_prior is False
    assert cfg.log_image_enabled == ("Residual",)
    assert cfg.log_plot_enabled == ("SolverGN",)

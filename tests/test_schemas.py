"""Config schema validation: typo'd component names and inconsistent
settings fail BEFORE training (ref schemas/base_schema.py discipline)."""

import os

import pytest

import anemoi_tpu
from anemoi_tpu.training.schemas import validate_config
from anemoi_tpu.utils.config import load_config

PACKAGED = os.path.join(os.path.dirname(anemoi_tpu.__file__), "config")


def base_config(**model_overrides):
    cfg = {
        "data": {
            "datasets": {"data": {"kind": "synthetic",
                                  "nodes": {"name": "ReducedGaussianGridNodes", "grid": "o8"},
                                  "variables": ["q", "t"], "num_times": 8}},
            "forcing": [],
            "processors": [{"name": "InputNormalizer", "default": "mean-std"}],
        },
        "model": {"name": "AnemoiModelEncProcDec", "num_channels": 16,
                  **model_overrides},
        "training": {"max_epochs": 1},
    }
    return cfg


def test_valid_config_passes():
    validate_config(base_config())


@pytest.mark.parametrize("field,value,err", [
    ("shard_strategy", "edge", "shard_strategy"),  # typo of "edges"
    ("graph_attention_backend", "triton", "graph_attention_backend"),
    ("name", "AnemoiModelEncProcDecTypo", "model"),
])
def test_bad_model_fields_fail(field, value, err):
    with pytest.raises(Exception, match=err):
        validate_config(base_config(**{field: value}))


def test_bad_bounding_name_fails():
    with pytest.raises(Exception, match="bounding"):
        validate_config(base_config(bounding=[{"name": "ReluBound"}]))  # typo


def test_bad_component_names_fail():
    with pytest.raises(Exception, match="processor"):
        validate_config(base_config(processor={"name": "GraphTransformerProc"}))
    with pytest.raises(Exception, match="encoder"):
        validate_config(base_config(encoder={"name": "GTForwardMapper"}))


def test_bad_loss_and_scaler_fail():
    cfg = base_config()
    cfg["training"]["loss"] = {"name": "WeightedMSELos"}
    with pytest.raises(Exception, match="loss"):
        validate_config(cfg)
    cfg = base_config()
    cfg["training"]["loss"] = {"name": "WeightedMSELoss"}
    cfg["training"]["scalers"] = {"area": {"name": "GraphNodeAttrScaler"}}
    with pytest.raises(Exception, match="scaler"):
        validate_config(cfg)


def test_bad_preprocessor_fails():
    cfg = base_config()
    cfg["data"]["processors"] = [{"name": "InputNormaliser"}]  # typo
    with pytest.raises(Exception, match="preprocessor"):
        validate_config(cfg)


def test_hardware_divisibility():
    cfg = base_config()
    cfg["hardware"] = {"num_devices": 8, "num_devices_per_model": 3}
    with pytest.raises(Exception, match="divisible"):
        validate_config(cfg)
    cfg["hardware"] = {"num_devices": 8, "num_devices_per_model": 2,
                       "num_devices_per_ensemble": 2}
    validate_config(cfg)


def test_rollout_consistency():
    cfg = base_config()
    cfg["training"]["rollout"] = {"start": 4, "max": 2}
    with pytest.raises(Exception, match="rollout"):
        validate_config(cfg)


def test_graph_recipe_builder_names():
    cfg = base_config()
    cfg["graph"] = {"recipe": {
        "nodes": {"data": {"node_builder": {"name": "ReducedGaussianNodes"}}},  # typo
    }}
    with pytest.raises(Exception, match="node builder"):
        validate_config(cfg)
    cfg["graph"] = {"recipe": {
        "edges": [{"source_name": "a", "target_name": "b",
                   "edge_builder": {"name": "CutoffEdges"}}],  # typo (case)
    }}
    with pytest.raises(Exception, match="edge builder"):
        validate_config(cfg)


def test_forcing_diagnostic_overlap_fails():
    cfg = base_config()
    cfg["data"]["forcing"] = ["q"]
    cfg["data"]["diagnostic"] = ["q"]
    with pytest.raises(Exception, match="overlap"):
        validate_config(cfg)


def test_all_packaged_presets_validate():
    """Every shipped example/preset config composes and validates (W10:
    'the shipped example config is not exercised by any test')."""
    example = os.path.join(PACKAGED, "example_o96_gt.yaml")
    cfg = load_config(example, search_paths=[PACKAGED])
    validate_config(cfg.to_dict())

"""Every shipped config preset composes, validates, and micro-trains e2e.

Mirrors the reference's config-matrix integration suite
(/root/reference/training/tests/integration/test_training_cycle.py with its
config/{test_global,test_lam,test_stretched,test_autoencoder,
test_ensemble_crps,test_multidatasets,test_transport,...}.yaml matrix),
driven from the PACKAGED presets instead of separate test configs so the
shipped tree is what gets exercised."""

import glob
import os

import numpy as np
import pytest

import anemoi_tpu

CONFIG_ROOT = os.path.join(os.path.dirname(anemoi_tpu.__file__), "config")
EXPERIMENTS = sorted(
    os.path.splitext(os.path.basename(p))[0]
    for p in glob.glob(os.path.join(CONFIG_ROOT, "*.yaml"))
)

# ---- tiny-scale overrides (the reference's testing_modifications.yaml) ----
TINY_COMMON = [
    "training.max_epochs=1",
    "training.max_steps=3",
    "training.lr.rate=1e-3",
    "training.lr.warmup=2",
    "training.lr.iterations=10",
    "model.num_channels=16",
    "model.processor.num_layers=1",
    "dataloader.batch_size=1",
    "dataloader.validation_fraction=0.2",
    "diagnostics.callbacks=[]",
    "diagnostics.log_interval=1",
    "diagnostics.checkpoint_interval=1000",
]

# per-preset graph/data shrink (dotted paths must traverse dicts only)
_SMALL_DATA = [
    "data.datasets.data.nodes.grid=o8",
    "data.datasets.data.num_times=16",
    "graph.recipe.nodes.data.node_builder.grid=o8",
]
_SMALL_MESH = ["graph.recipe.nodes.hidden.node_builder.resolution=1"]
TINY_PER_EXPERIMENT = {
    "example_o96_gt": _SMALL_DATA + _SMALL_MESH + ["model.processor.num_layers=1"],
    "lam": _SMALL_DATA + [
        "graph.recipe.nodes.hidden.node_builder.resolution=2",
        "graph.recipe.nodes.hidden.node_builder.margin_radius_km=2000.0",
    ],
    "stretched": _SMALL_DATA + [
        "graph.recipe.nodes.hidden.node_builder.global_resolution=1",
        "graph.recipe.nodes.hidden.node_builder.lam_resolution=2",
    ],
    "ensemble_crps": _SMALL_DATA + _SMALL_MESH + ["training.ensemble_size=2"],
    "hierarchical": _SMALL_DATA + [
        "graph.recipe.nodes.hidden_1.node_builder.resolution=2",
        "graph.recipe.nodes.hidden_2.node_builder.resolution=1",
    ],
    "hierarchical_autoencoder": _SMALL_DATA + [
        "graph.recipe.nodes.hidden_1.node_builder.resolution=2",
        "graph.recipe.nodes.hidden_2.node_builder.resolution=1",
    ],
    "autoencoder": _SMALL_DATA + _SMALL_MESH,
    "point_wise": _SMALL_DATA + _SMALL_MESH,
    "temporal_downscaler": _SMALL_DATA + _SMALL_MESH,
    "temporal_downscaler_ensemble": _SMALL_DATA + _SMALL_MESH + [
        "training.ensemble_size=2",
    ],
    "transport_edm_diffusion": _SMALL_DATA + _SMALL_MESH,
    "transport_edm_diffusion_tendency": _SMALL_DATA + _SMALL_MESH,
    "transport_stochastic_interpolant": _SMALL_DATA + _SMALL_MESH,
    "transport_stochastic_interpolant_tendency": _SMALL_DATA + _SMALL_MESH,
    "transformer": _SMALL_DATA + _SMALL_MESH + [
        "model.processor.num_layers=1",
        "model.processor.window_size=16",
        "model.processor.num_heads=2",
        "model.num_channels=16",
    ],
    "multi": [
        "data.datasets.era.nodes.grid=o8",
        "data.datasets.era.num_times=16",
        "data.datasets.obs.nodes.grid=o4",
        "data.datasets.obs.num_times=16",
        "graph.recipe.nodes.era.node_builder.grid=o8",
        "graph.recipe.nodes.obs.node_builder.grid=o4",
    ] + _SMALL_MESH,
}


def _load(name, overrides=()):
    from anemoi_tpu.utils.config import load_config

    return load_config(
        os.path.join(CONFIG_ROOT, f"{name}.yaml"),
        overrides=list(overrides),
        search_paths=[CONFIG_ROOT],
    )


def test_experiment_presets_discovered():
    # the reference ships lam/stretched/ensemble/transport/hierarchical/
    # autoencoder/downscaler/multi experiment presets; so do we
    for required in (
        "lam", "stretched", "ensemble_crps", "hierarchical", "autoencoder",
        "hierarchical_autoencoder", "temporal_downscaler",
        "temporal_downscaler_ensemble", "multi",
        "point_wise", "transformer", "transport_edm_diffusion",
        "transport_edm_diffusion_tendency", "transport_stochastic_interpolant",
        "transport_stochastic_interpolant_tendency",
    ):
        assert required in EXPERIMENTS, (required, EXPERIMENTS)


@pytest.mark.parametrize("name", EXPERIMENTS)
def test_preset_composes_and_validates(name):
    """Composition resolves every defaults group and pydantic accepts it."""
    from anemoi_tpu.training.schemas import validate_config

    cfg = _load(name)
    assert "model" in cfg and "training" in cfg and "graph" in cfg
    if name == "npy_template":
        return
    validate_config(cfg.to_dict())


@pytest.mark.parametrize("name", sorted(TINY_PER_EXPERIMENT))
def test_preset_micro_trains(name, tmp_path):
    """One tiny end-to-end train step per shipped experiment preset."""
    from anemoi_tpu.training.trainer import AnemoiTrainer

    cfg = _load(
        name,
        overrides=TINY_COMMON
        + TINY_PER_EXPERIMENT[name]
        + [f"output_dir={tmp_path / name}"],
    ).to_dict()
    cfg["graph"]["save_path"] = str(tmp_path / f"{name}_graph.npz")
    trainer = AnemoiTrainer(cfg, output_dir=cfg["output_dir"])
    result = trainer.train()
    assert np.isfinite(result["final_loss"]), (name, result)

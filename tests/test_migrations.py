"""Checkpoint-migration tests.

The pre-scan -> scan migration must restack per-layer processor parameters
(blocks_0, blocks_1, ...) into the nn.scan layout (blocks/block, leading
axis = layer) with exact forward parity (ref models/migrations/migrator.py
pattern: old checkpoints load on new code)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import serialization

from anemoi_tpu.data_indices import IndexCollection
from anemoi_tpu.models.interface import AnemoiModelInterface
from anemoi_tpu.models.migrations import MIGRATOR, Migrator

from tests.test_models import NAMES, make_statistics, model_config


def make_indices():
    return IndexCollection(NAMES, forcing=["cos_lat", "z"], diagnostic=["tp"])


def build(tiny_graph, processor, scan_layers):
    cfg = {"model": model_config(processor=processor), "data": {"processors": []}}
    cfg["model"]["processor"]["scan_layers"] = scan_layers
    return AnemoiModelInterface(
        config=cfg,
        graph=tiny_graph,
        data_indices={"data": make_indices()},
        statistics={"data": make_statistics()},
    )


def test_migrator_records_applied_list():
    ckpt = MIGRATOR.migrate({"metadata": {}})
    names = ckpt["metadata"]["migrations"]
    assert names == [m.name for m in MIGRATOR.migrations]
    # idempotent: nothing pending after migrate
    assert MIGRATOR.pending(ckpt) == []


def test_migrator_rollback():
    ckpt = MIGRATOR.migrate({"metadata": {}})
    back = MIGRATOR.rollback_to(ckpt, "20260817000000_initial_format")
    assert back["metadata"]["migrations"] == ["20260817000000_initial_format"]


def test_registration_order_enforced():
    m = Migrator()
    m.register("2_b")(lambda c: c)
    with pytest.raises(AssertionError):
        m.register("1_a")(lambda c: c)


@pytest.mark.parametrize("processor", ["GNNProcessor", "GraphTransformerProcessor"])
def test_prescan_params_migrate_with_forward_parity(tiny_graph, processor):
    old = build(tiny_graph, processor, scan_layers=False)
    new = build(tiny_graph, processor, scan_layers=True)
    old_params = old.init_params(jax.random.PRNGKey(0))
    template = jax.device_get(new.init_params(jax.random.PRNGKey(1)))

    # simulate a pre-scan checkpoint: raw state dict without the migration
    raw = serialization.to_state_dict(jax.device_get(old_params))
    bundle = {"metadata": {"migrations": ["20260817000000_initial_format"]}}
    bundle, raw = MIGRATOR.migrate(bundle, raw)
    assert "20260817120000_stack_processor_scan" in bundle["metadata"]["migrations"]

    migrated = serialization.from_state_dict(template, raw)
    # structure now matches the scan template exactly
    assert jax.tree_util.tree_structure(migrated) == jax.tree_util.tree_structure(
        template
    )

    n_grid = tiny_graph["data"].num_nodes
    rng = np.random.default_rng(0)
    x = {"data": jnp.asarray(rng.normal(size=(1, 2, 1, n_grid, 5)), dtype=jnp.float32)}
    y_old = np.asarray(old.apply(old_params, x)["data"])
    y_new = np.asarray(new.apply(migrated, x)["data"])
    np.testing.assert_allclose(y_new, y_old, rtol=2e-5, atol=2e-5)


def test_scan_checkpoint_passes_through_unchanged(tiny_graph):
    """Already-scanned params are a no-op for the stacking migration."""
    iface = build(tiny_graph, "GraphTransformerProcessor", scan_layers=True)
    params = jax.device_get(iface.init_params(jax.random.PRNGKey(0)))
    raw = serialization.to_state_dict(params)
    bundle = {"metadata": {"migrations": ["20260817000000_initial_format"]}}
    _, migrated = MIGRATOR.migrate(bundle, raw)
    restored = serialization.from_state_dict(params, migrated)
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_frozen_fixture_checkpoint_loads_and_predicts():
    """A committed round-2-format inference bundle keeps loading on current
    code -- the reference's fixture-checkpoint discipline
    (models/tests/migrations/): format changes must ship a migration."""
    import os

    import numpy as np

    import jax
    import jax.numpy as jnp

    from anemoi_tpu.training.checkpoint import load_inference_checkpoint

    path = os.path.join(os.path.dirname(__file__), "fixtures", "inference_ckpt_r2")
    iface, params = load_inference_checkpoint(path)
    n_grid = iface.model_graph.num_nodes["data"]
    nv = iface.data_indices["data"].num_data_vars
    rng = np.random.default_rng(0)
    batch = {"data": jnp.asarray(rng.normal(size=(1, 2, 1, n_grid, nv)), jnp.float32)}
    out = iface.predict_step(params, batch)
    assert np.isfinite(np.asarray(out["data"])).all()
    assert out["data"].shape[-2] == n_grid


def test_migration_script_scaffold_roundtrip(tmp_path):
    """create -> load -> apply -> rollback round trip for scaffolded scripts
    (the reference's `anemoi-models migration create` discipline,
    migrations/migrator.py + commands/migration.py)."""
    from anemoi_tpu.models.migrations import (
        MIGRATOR,
        create_migration_script,
        load_migration_scripts,
    )

    n_before = len(MIGRATOR.migrations)
    path = create_migration_script("test_roundtrip", str(tmp_path))
    text = open(path).read()
    assert "Parent:" in text and "Signature:" in text
    assert "@register_migration(" in text and "@forward.rollback" in text

    # customise the scaffold so the round trip is observable
    text = text.replace(
        "    # ... edit config / metadata here ...",
        '    ckpt["marker"] = 1',
    )
    text = text.replace(
        '    ckpt = dict(ckpt)\n    return ckpt\n\n\n# Optional',
        '    ckpt = dict(ckpt)\n    ckpt.pop("marker", None)\n    return ckpt\n\n\n# Optional',
    )
    open(path, "w").write(text)

    loaded = load_migration_scripts(str(tmp_path))
    assert len(loaded) == 1
    try:
        name = MIGRATOR.migrations[-1].name
        assert name.endswith("_test_roundtrip")

        ckpt = {"config": {}, "metadata": {}}
        migrated = MIGRATOR.migrate(ckpt)
        assert migrated["marker"] == 1
        assert name in migrated["metadata"]["migrations"]

        rolled = MIGRATOR.rollback_to(migrated, MIGRATOR.migrations[-2].name)
        assert "marker" not in rolled
        assert name not in rolled["metadata"]["migrations"]
    finally:
        # keep the global registry clean for other tests
        MIGRATOR.migrations = MIGRATOR.migrations[:n_before]


def test_migration_cli_create(tmp_path, capsys):
    from anemoi_tpu.models.migrations import MIGRATOR
    from anemoi_tpu.training.cli import main

    n_before = len(MIGRATOR.migrations)
    rc = main(["checkpoint", "migrate", "--create", "cli_scaffold",
               "--scripts-dir", str(tmp_path)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "created" in out
    import os

    files = [f for f in os.listdir(tmp_path) if f.endswith("_cli_scaffold.py")]
    assert len(files) == 1
    assert len(MIGRATOR.migrations) == n_before  # creation does not register


def test_hierarchical_module_name_migration():
    """Old hierarchical checkpoints (flax auto-named sub-modules in call
    order) rename into the explicit stable layout (encoder_<ds>,
    proc_down_<level>, processor, up_<level>, ...)."""
    from anemoi_tpu.models.migrations import _hier_names_params, _hier_rename_map

    ckpt = {
        "config": {"model": {
            "name": "AnemoiModelEncProcDecHierarchical",
            "hidden_names": ["hidden_1", "hidden_2", "hidden_3"],
            "encoder": {"name": "GraphTransformerForwardMapper"},
            "decoder": {"name": "GraphTransformerBackwardMapper"},
            "processor": {"name": "GraphTransformerProcessor"},
        }},
        "data_indices": {"data": {}},
    }
    ren = _hier_rename_map(ckpt)
    assert ren == {
        "GraphTransformerForwardMapper_0": "encoder_data",
        "GraphTransformerForwardMapper_1": "down_hidden_1",
        "GraphTransformerForwardMapper_2": "down_hidden_2",
        "GraphTransformerProcessor_0": "proc_down_hidden_1",
        "GraphTransformerProcessor_1": "proc_down_hidden_2",
        "GraphTransformerProcessor_2": "processor",
        "GraphTransformerProcessor_3": "proc_up_hidden_2",
        "GraphTransformerProcessor_4": "proc_up_hidden_1",
        "GraphTransformerBackwardMapper_0": "up_hidden_3",
        "GraphTransformerBackwardMapper_1": "up_hidden_2",
        "GraphTransformerBackwardMapper_2": "decoder_data",
    }
    params = {"params": {k: {"w": k} for k in list(ren) + ["node_attributes_data"]}}
    out = _hier_names_params(params, ckpt)
    assert set(out["params"]) == set(ren.values()) | {"node_attributes_data"}
    # non-hierarchical checkpoints pass through untouched
    flat_ckpt = {"config": {"model": {"name": "AnemoiModelEncProcDec"}}}
    assert _hier_names_params(params, flat_ckpt) is params
    # hidden levels inferred from trainable_parameters when hidden_names absent
    ckpt2 = {
        "config": {"model": {
            "name": "AnemoiModelEncProcDecHierarchical",
            "trainable_parameters": {"data": 2, "hidden_2": 2, "hidden_1": 2},
        }},
        "data_indices": {"data": {}},
    }
    ren2 = _hier_rename_map(ckpt2)
    assert ren2["GraphTransformerProcessor_1"] == "processor"
    assert ren2["GraphTransformerForwardMapper_1"] == "down_hidden_1"

import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from anemoi_tpu.training.callbacks import (
    EarlyStopping,
    TimeLimit,
    WeightAveraging,
)
from anemoi_tpu.training.metrics import make_rollout_eval_fn, variable_groups


def test_variable_groups():
    groups = variable_groups(["t_850", "t_500", "q_850", "10u", "tp"])
    assert groups["t"] == [0, 1]
    assert groups["q"] == [2]
    assert groups["sfc"] == [3, 4]


def test_rollout_eval_metrics(tiny_graph, rng):
    from tests.test_models import build_interface

    iface = build_interface(tiny_graph)
    params = iface.init_params(jax.random.PRNGKey(0))
    fn = make_rollout_eval_fn(iface, rollout=2)
    n_grid = tiny_graph["data"].num_nodes
    batch = {"data": jnp.asarray(rng.normal(size=(1, 4, 1, n_grid, 6)), dtype=jnp.float32)}
    out = fn(params, batch)
    # groups: q,t,u prognostic + tp diagnostic are all surface names -> 'sfc'
    assert any(k.startswith("rmse/data/sfc/") for k in out)
    assert {k.rsplit("/", 1)[1] for k in out} == {"1", "2"}
    assert all(np.isfinite(float(v)) for v in out.values())


def test_early_stopping():
    cb = EarlyStopping(monitor="val_loss", patience=2)
    for v in [1.0, 0.9, 0.95, 0.96]:
        cb.on_validation(None, 0, {"val_loss": v})
    assert cb.should_stop(None)
    cb2 = EarlyStopping(monitor="val_loss", patience=2)
    for v in [1.0, 0.9, 0.8, 0.7]:
        cb2.on_validation(None, 0, {"val_loss": v})
    assert not cb2.should_stop(None)


def test_time_limit():
    cb = TimeLimit(limit="00:00:01")
    assert cb.limit_s == 1.0
    assert not cb.should_stop(None)
    cb.start -= 2
    assert cb.should_stop(None)


def test_weight_averaging_ema():
    class FakeTrainer:
        class state:
            params = {"w": jnp.asarray(0.0)}

    cb = WeightAveraging(decay=0.5)
    t = FakeTrainer()
    cb.on_step(t, 0, {})
    t.state.params = {"w": jnp.asarray(1.0)}
    cb.on_step(t, 0, {})
    np.testing.assert_allclose(float(cb.avg_params["w"]), 0.5)
    t.state.params = {"w": jnp.asarray(1.0)}
    cb.on_step(t, 0, {})
    np.testing.assert_allclose(float(cb.avg_params["w"]), 0.75)


def test_weight_averaging_swa():
    class FakeTrainer:
        class state:
            params = {"w": jnp.asarray(0.0)}

    cb = WeightAveraging(kind="swa")
    t = FakeTrainer()
    for v in [0.0, 1.0, 2.0]:
        t.state.params = {"w": jnp.asarray(v)}
        cb.on_step(t, 0, {})
    np.testing.assert_allclose(float(cb.avg_params["w"]), 1.0)  # mean of 0,1,2


def test_compare_variables():
    from anemoi_tpu.data_indices.collection import compare_variables

    n2i = {"a": 0, "b": 1, "c": 2}
    compare_variables(None, n2i)  # no-op
    compare_variables(dict(n2i), n2i)  # identical
    # pure rename in the same slot: warns, no raise
    compare_variables({"a": 0, "x": 1, "c": 2}, n2i)
    # same names, different order: raises
    with pytest.raises(ValueError, match="different positions"):
        compare_variables({"a": 1, "b": 0, "c": 2}, n2i)
    # renamed variable in a DIFFERENT slot: raises
    with pytest.raises(ValueError, match="variable order"):
        compare_variables({"a": 0, "b": 1, "x": 3}, n2i)


def test_check_variable_order_callback():
    from anemoi_tpu.data_indices.collection import IndexCollection
    from anemoi_tpu.training.callbacks import CheckVariableOrder

    n2i = {"u": 0, "v": 1}

    class _DM:
        name_to_index = {"data": n2i}

    class _Trainer:
        data_indices = {"data": IndexCollection(n2i)}
        datamodule = _DM()
        ckpt_name_to_index = None

    cb = CheckVariableOrder()
    cb.on_train_start(_Trainer())  # consistent: passes

    bad = _Trainer()
    bad.ckpt_name_to_index = {"data": {"u": 1, "v": 0}}
    with pytest.raises(ValueError):
        cb.on_train_start(bad)


def test_profile_training_reports(tmp_path):
    """profile_training writes speed/time/memory/system reports; the time
    report carries per-phase sections (ref per-hook time report)."""
    import json

    from anemoi_tpu.training.profiler import profile_training
    from anemoi_tpu.training.trainer import AnemoiTrainer
    from tests.test_training import make_config

    cfg = make_config(tmp_path)
    cfg["training"]["max_epochs"] = 0
    trainer = AnemoiTrainer(cfg, output_dir=cfg["output_dir"])
    out = profile_training(trainer, num_steps=3)
    with open(out["report"]) as f:
        reports = json.load(f)
    assert reports["speed"]["num_steps"] >= 1
    for phase in ("dataloader", "transfer", "train_step"):
        assert phase in reports["time"], reports["time"]
        assert reports["time"][phase]["count"] >= 1
    assert abs(sum(v["pct"] for v in reports["time"].values()) - 100.0) < 1.0
    assert "host_vmrss_kb" in reports["memory"]


def test_anomaly_detection_flag(tmp_path):
    """diagnostics.debug.anomaly_detection flips jax_debug_nans (the
    reference's Lightning detect_anomaly wiring, train/train.py:722)."""
    import jax

    from anemoi_tpu.training.trainer import AnemoiTrainer
    from tests.test_training import make_config

    cfg = make_config(tmp_path)
    cfg["diagnostics"]["debug"] = {"anomaly_detection": True}
    cfg["training"]["max_epochs"] = 0
    try:
        AnemoiTrainer(cfg, output_dir=cfg["output_dir"])
        assert jax.config.jax_debug_nans
    finally:
        jax.config.update("jax_debug_nans", False)


def test_rollout_eval_per_timestep(tiny_graph, rng):
    """Per-output-timestep breakdown (ref callbacks/per_timestep_metrics.py):
    t_<k> keys appear only for multi-output-step models and average back to
    the aggregate step-1 metric."""
    from tests.test_models import build_interface

    iface = build_interface(tiny_graph, n_step_output=2)
    params = iface.init_params(jax.random.PRNGKey(0))
    fn = make_rollout_eval_fn(iface, rollout=1, metrics=("mse",), per_timestep=True)
    n_grid = tiny_graph["data"].num_nodes
    batch = {"data": jnp.asarray(rng.normal(size=(1, 4, 1, n_grid, 6)), dtype=jnp.float32)}
    out = fn(params, batch)
    t_keys = sorted(k for k in out if "/t_" in k)
    assert t_keys == ["mse/data/sfc/t_1", "mse/data/sfc/t_2"]
    per_t = np.array([float(out[k]) for k in t_keys])
    agg = float(out["mse/data/sfc/1"])
    np.testing.assert_allclose(per_t.mean(), agg, rtol=1e-4)

    # single-output-step model: no t_ keys
    iface1 = build_interface(tiny_graph)
    params1 = iface1.init_params(jax.random.PRNGKey(0))
    fn1 = make_rollout_eval_fn(iface1, rollout=1, per_timestep=True)
    out1 = fn1(params1, batch)
    assert not any("/t_" in k for k in out1)


def test_spatial_masks(tiny_graph):
    """Focus-area masks (ref geospatial/focus_area.py): bbox, node-attribute
    and no-op forms restrict latlons + [..., G, V] fields consistently."""
    from anemoi_tpu.training.plots import build_spatial_mask

    coords = tiny_graph["data"].coords  # radians [G, 2]
    lats, lons = coords[:, 0], coords[:, 1]
    n = len(lats)
    field = np.arange(n * 3, dtype=np.float32).reshape(n, 3)

    noop = build_spatial_mask()
    la, lo, f = noop.apply(tiny_graph, "data", lats, lons, field)
    assert len(la) == n and f.shape == (n, 3) and noop.tag == ""

    bbox = build_spatial_mask(latlon_bbox=(0.0, -180.0, 90.0, 180.0))
    la, lo, f = bbox.apply(tiny_graph, "data", lats, lons, field)
    assert 0 < len(la) < n  # northern hemisphere only
    assert np.all(np.rad2deg(la) >= 0.0)
    assert f.shape == (len(la), 3)
    np.testing.assert_array_equal(f, field[bbox.focus_mask])

    mask = np.zeros(n, dtype=bool)
    mask[:5] = True
    tiny_graph["data"].attributes["roi"] = mask
    attr = build_spatial_mask(node_attribute_name="roi")
    la, lo, f = attr.apply(tiny_graph, "data", lats, lons, field)
    assert len(la) == 5 and f.shape == (5, 3) and attr.tag == "_roi"
    with pytest.raises(KeyError):
        build_spatial_mask(node_attribute_name="nope").apply(
            tiny_graph, "data", lats, lons, field
        )
    with pytest.raises(ValueError):
        build_spatial_mask(latlon_bbox=(50.0, 0.0, 10.0, 20.0))


def test_plot_ensemble_maps(tiny_graph):
    import matplotlib

    matplotlib.use("Agg")
    from anemoi_tpu.training.plots import plot_ensemble_maps

    coords = tiny_graph["data"].coords
    n = coords.shape[0]
    members = np.random.default_rng(0).normal(size=(3, n)).astype(np.float32)
    fig = plot_ensemble_maps(coords[:, 0], coords[:, 1], members, members[0], "2t")
    # truth + mean + spread + 3 members
    assert len(fig.axes) >= 6
    import matplotlib.pyplot as plt

    plt.close(fig)


def test_build_colormaps():
    """Custom colormap configs (ref utils/custom_colormaps.py): named
    matplotlib maps and explicit color-level lists, bound per variable."""
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib.colors import ListedColormap

    from anemoi_tpu.training.plots import build_colormaps

    cmaps = build_colormaps([
        {"name": "RdBu_r", "variables": ["t_850", "t_500"]},
        {"clevels": ["#ffffff", "#88ccee", "#332288"], "variables": ["tp"]},
    ])
    assert cmaps["t_850"].name == "RdBu_r" and cmaps["t_500"].name == "RdBu_r"
    assert isinstance(cmaps["tp"], ListedColormap) and cmaps["tp"].N == 3
    assert build_colormaps(None) == {}

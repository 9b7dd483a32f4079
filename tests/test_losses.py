import numpy as np
import pytest

import jax.numpy as jnp

from anemoi_tpu.data_indices import IndexCollection
from anemoi_tpu.training.losses import ScaleTensor, get_loss_function
from anemoi_tpu.training.losses.leaves import KernelCRPS, WeightedMSELoss
from anemoi_tpu.training.losses.scalers import create_scalers, split_variable_name

SHAPE = (2, 1, 1, 10, 3)  # B,T,E,G,V


def test_unweighted_mse(rng):
    pred = jnp.asarray(rng.normal(size=SHAPE), dtype=jnp.float32)
    target = jnp.asarray(rng.normal(size=SHAPE), dtype=jnp.float32)
    loss = WeightedMSELoss()
    expected = np.mean((np.asarray(pred) - np.asarray(target)) ** 2)
    np.testing.assert_allclose(float(loss(pred, target)), expected, rtol=1e-5)


def test_grid_scaler_weighting(rng):
    pred = jnp.asarray(rng.normal(size=SHAPE), dtype=jnp.float32)
    target = jnp.zeros(SHAPE)
    w = rng.uniform(0.1, 1.0, SHAPE[3]).astype(np.float32)
    st = ScaleTensor().add_scaler("grid", w, "area")
    loss = WeightedMSELoss(scalers=st)
    err = np.asarray(pred) ** 2
    expected = (err * w[None, None, None, :, None]).sum() / (
        w.sum() * SHAPE[0] * SHAPE[1] * SHAPE[2] * SHAPE[4]
    )
    np.testing.assert_allclose(float(loss(pred, target)), expected, rtol=1e-5)


def test_nan_masking(rng):
    pred = jnp.ones(SHAPE)
    target = np.zeros(SHAPE, dtype=np.float32)
    target[0, 0, 0, :5, 0] = np.nan
    loss = WeightedMSELoss()
    # NaNs excluded from numerator and denominator -> still exactly 1.0
    np.testing.assert_allclose(float(loss(pred, jnp.asarray(target))), 1.0, rtol=1e-6)


def test_per_variable_squash_false(rng):
    pred = jnp.asarray(rng.normal(size=SHAPE), dtype=jnp.float32)
    target = jnp.zeros(SHAPE)
    loss = WeightedMSELoss()
    per_var = loss(pred, target, squash=False)
    assert per_var.shape == (SHAPE[-1],)
    expected = np.mean(np.asarray(pred) ** 2, axis=(0, 1, 2, 3))
    np.testing.assert_allclose(np.asarray(per_var), expected, rtol=1e-5)


def test_kernel_crps_perfect_ensemble():
    # all members equal truth -> CRPS = 0
    pred = jnp.ones((1, 1, 4, 5, 2))
    target = jnp.ones((1, 1, 1, 5, 2))
    loss = KernelCRPS()
    np.testing.assert_allclose(float(loss(pred, target)), 0.0, atol=1e-6)


def test_kernel_crps_spread_reduces_loss(rng):
    target = jnp.zeros((1, 1, 1, 50, 1))
    biased = jnp.ones((1, 1, 4, 50, 1))  # all members off by 1
    spread = jnp.asarray(
        np.stack([np.full((50, 1), v) for v in [-1.5, -0.5, 0.5, 1.5]])[None, None]
    )
    loss = KernelCRPS()
    assert float(loss(spread, target)) < float(loss(biased, target))


def test_loss_factory_with_scalers(tiny_graph):
    names = {"q": 0, "t_850": 1, "t_500": 2, "cos_lat": 3}
    idx = IndexCollection(names, forcing=["cos_lat"])
    scalers = create_scalers(
        {
            "area": {"name": "GraphNodeAttributeScaler", "nodes_name": "data",
                     "attribute_name": "area_weight"},
            "level": {"name": "ReluVariableLevelScaler", "slope": 0.001,
                      "y_intercept": 0.2},
        },
        graph=tiny_graph,
        data_indices=idx,
    )
    assert scalers["area"][0] == ("grid",)
    assert scalers["level"][0] == ("variable",)
    # t_850 -> 0.85, t_500 -> 0.5, q (no level) -> 1
    lvl = scalers["level"][1]
    model_names = idx.model.output.ordered_names
    np.testing.assert_allclose(lvl[model_names.index("t_850")], 0.85, atol=1e-6)
    np.testing.assert_allclose(lvl[model_names.index("t_500")], 0.5, atol=1e-6)
    np.testing.assert_allclose(lvl[model_names.index("q")], 1.0)

    loss = get_loss_function({"name": "WeightedMSELoss", "scalers": ["area", "level"]}, scalers)
    n_grid = tiny_graph["data"].num_nodes
    pred = jnp.ones((1, 1, 1, n_grid, 3))
    out = float(loss(pred, jnp.zeros_like(pred)))
    assert np.isfinite(out) and out > 0


def test_split_variable_name():
    assert split_variable_name("t_850") == ("t", 850)
    assert split_variable_name("10u") == ("10u", None)
    assert split_variable_name("z_surface") == ("z_surface", None)


def test_multiscale_loss_wrapper():
    """MultiscaleLossWrapper (ref losses/multiscale.py:35): inner loss summed
    over native + coarsened grids with per-scale weights."""
    from anemoi_tpu.training.losses import get_loss_function

    G, V = 8, 2
    rng = np.random.default_rng(0)
    pred = jnp.asarray(rng.normal(size=(1, 1, 1, G, V)), dtype=jnp.float32)
    target = jnp.asarray(rng.normal(size=(1, 1, 1, G, V)), dtype=jnp.float32)

    inner_cfg = {"name": "WeightedMSELoss", "scalers": []}
    base_val = float(get_loss_function(inner_cfg)(pred, target))

    # native-only wrapper == inner loss
    ms = get_loss_function(
        {"name": "MultiscaleLossWrapper", "loss": dict(inner_cfg), "scales": []}
    )
    np.testing.assert_allclose(float(ms(pred, target)), base_val, rtol=1e-6)

    # identity "coarse" scale (each node maps to itself) changes nothing
    ident = {
        "edge_index": np.stack([np.arange(G), np.arange(G)]),
        "weights": np.ones(G, np.float32),
        "num_coarse": G,
        "weight": 3.0,
    }
    ms2 = get_loss_function(
        {"name": "MultiscaleLossWrapper", "loss": dict(inner_cfg), "scales": [ident]}
    )
    np.testing.assert_allclose(float(ms2(pred, target)), base_val, rtol=1e-6)

    # true 4->1 coarsening: averaging blocks of 4 shrinks the error of a
    # zero-mean field, so the multiscale value must drop below native MSE
    coarse = {
        "edge_index": np.stack([np.arange(G), np.arange(G) // 4]),
        "weights": np.ones(G, np.float32),
        "num_coarse": 2,
        "weight": 1.0,
    }
    ms3 = get_loss_function(
        {"name": "MultiscaleLossWrapper", "loss": dict(inner_cfg),
         "scales": [coarse], "native_weight": 1.0}
    )
    val3 = float(ms3(pred, target))
    assert val3 < base_val
    # exact decomposition: 0.5 * (native + coarse-projected mse)
    block_p = np.asarray(pred).reshape(1, 1, 1, 2, 4, V).mean(axis=4)
    block_t = np.asarray(target).reshape(1, 1, 1, 2, 4, V).mean(axis=4)
    coarse_mse = float(np.mean((block_p - block_t) ** 2))
    np.testing.assert_allclose(val3, 0.5 * (base_val + coarse_mse), rtol=1e-5)

    # graph-resolved form + grid scalers dropped at coarse scales
    from anemoi_tpu.graphs.graph import EdgeSet, Graph, NodeSet

    g = Graph()
    lat = np.linspace(-1.0, 1.0, G)
    g["data"] = NodeSet(coords=np.stack([lat, np.zeros(G)], axis=1))
    g["coarse"] = NodeSet(coords=np.stack([lat[::4], np.zeros(2)], axis=1))
    es = EdgeSet(edge_index=np.stack([np.arange(G), np.arange(G) // 4]))
    es.attributes["w"] = np.ones((G, 1), np.float32)
    g[("data", "coarse")] = es
    area = np.full(G, 0.5, np.float32)
    scalers = {"area": (("grid",), jnp.asarray(area))}
    ms4 = get_loss_function(
        {"name": "MultiscaleLossWrapper",
         "loss": {"name": "WeightedMSELoss", "scalers": ["area"]},
         "scales": [{"nodes": "coarse", "weight_attribute": "w", "weight": 1.0}]},
        scalers, graph=g,
    )
    val4 = float(ms4(pred, target))
    # uniform area weight is a no-op on the weighted mean -> same decomposition
    np.testing.assert_allclose(val4, 0.5 * (base_val + coarse_mse), rtol=1e-5)

    # NaN targets are masked, not smeared into the coarse cells
    t_nan = np.asarray(target).copy()
    t_nan[0, 0, 0, 0, 0] = np.nan
    v = float(ms3(pred, jnp.asarray(t_nan)))
    assert np.isfinite(v)


def test_nan_target_gradients_finite(rng):
    """ADVICE r1 (high): NaN targets must not poison gradients — both operands
    are zero-filled before the pointwise error (ref losses base.py mask_nans)."""
    import jax

    pred = jnp.asarray(rng.normal(size=SHAPE), dtype=jnp.float32)
    target = np.asarray(rng.normal(size=SHAPE), dtype=np.float32)
    target[0, 0, 0, :4, 1] = np.nan
    target = jnp.asarray(target)
    for name in ["WeightedMSELoss", "WeightedMAELoss", "WeightedHuberLoss",
                 "WeightedLogCoshLoss", "WeightedRMSELoss"]:
        loss = get_loss_function({"name": name})
        g = jax.grad(lambda p: loss(p, target))(pred)
        assert np.isfinite(np.asarray(g)).all(), f"{name} grad has non-finite entries"
        # masked entries contribute zero gradient
        assert np.all(np.asarray(g)[0, 0, 0, :4, 1] == 0.0), name


def test_logcosh_large_negative_residual():
    """ADVICE r1 (medium): logcosh must not overflow for large |pred-target|."""
    loss = get_loss_function({"name": "WeightedLogCoshLoss"})
    pred = jnp.full(SHAPE, -60.0)
    target = jnp.zeros(SHAPE)
    v = float(loss(pred, target))
    assert np.isfinite(v)
    np.testing.assert_allclose(v, 60.0 - np.log(2.0), rtol=1e-5)


def test_scale_tensor_update_freeze_validate():
    """Updating-scaler semantics + freezing + validation (ref
    scaler_tensor.py:197,311,340)."""
    import pytest as _pytest

    from anemoi_tpu.training.losses.base import ScaleTensor

    st = ScaleTensor()
    st.add_scaler(("grid",), jnp.ones(5), name="area")
    st.add_scaler(("variable",), jnp.full(3, 2.0), name="var")
    # same-name add composes multiplicatively
    st.add_scaler(("variable",), jnp.full(3, 0.5), name="var")
    np.testing.assert_allclose(np.asarray(st.scalers["var"][1]), 1.0)

    # update replaces values; shape guarded
    st.update_scaler("area", jnp.arange(5.0))
    np.testing.assert_allclose(np.asarray(st.scalers["area"][1]), np.arange(5.0))
    with _pytest.raises(AssertionError):
        st.update_scaler("area", jnp.ones(4))

    # freezing blocks updates unless overridden
    st.freeze(["area"])
    with _pytest.raises(ValueError):
        st.update_scaler("area", jnp.ones(5))
    st.update_scaler("area", jnp.ones(5), override=True)

    # validation against the canonical [B,T,E,G,V] shape
    st.validate((2, 1, 1, 5, 3))
    with _pytest.raises(ValueError):
        st.validate((2, 1, 1, 7, 3))


def test_scale_tensor_by_dim_selection():
    from anemoi_tpu.training.losses.base import ScaleTensor

    st = ScaleTensor()
    st.add_scaler(("grid",), jnp.ones(5), name="area")
    st.add_scaler(("variable",), jnp.ones(3), name="var")
    st.add_scaler(("grid", "variable"), jnp.ones((5, 3)), name="gv")
    assert set(st.subset_by_dim("grid").scalers) == {"area", "gv"}
    assert set(st.subset_by_dim(3).scalers) == {"area", "gv"}  # axis index
    assert set(st.without_by_dim("grid").scalers) == {"var"}
    assert set(st.without_by_dim(["grid", "variable"]).scalers) == set()


# ---------------------------------------------------------------------------
# loss wrappers (ref variable_mapper.py:29, aggregate.py:29)
# ---------------------------------------------------------------------------


def _wrapper_indices():
    # data order: q, t, z(forcing-only), tp(diagnostic)
    return IndexCollection(
        {"q": 0, "t": 1, "z": 2, "tp": 3}, forcing=["z"], diagnostic=["tp"]
    )


def test_loss_variable_mapper_filters_variables(rng):
    """LossVariableMapper == loss computed on the selected columns only
    (ref variable_mapper.py:298-385)."""
    idx = _wrapper_indices()
    # model output = [q, t, tp] (3 vars), data output = [q, t, tp]
    pred = jnp.asarray(rng.normal(size=(2, 1, 1, 6, 3)), dtype=jnp.float32)
    target = jnp.asarray(rng.normal(size=(2, 1, 1, 6, 3)), dtype=jnp.float32)
    wrapped = get_loss_function(
        {"name": "LossVariableMapper", "predicted_variables": ["q", "tp"],
         "loss": {"name": "WeightedMSELoss", "scalers": []}},
        {}, data_indices=idx,
    )
    sel = [idx.model.output.name_to_position[n] for n in ("q", "tp")]
    expected = np.mean(
        (np.asarray(pred)[..., sel] - np.asarray(target)[..., sel]) ** 2
    )
    np.testing.assert_allclose(float(wrapped(pred, target)), expected, rtol=1e-5)

    # squash=False scatters per-variable losses back to full width
    per_var = np.asarray(wrapped(pred, target, squash=False))
    assert per_var.shape == (3,)
    assert per_var[idx.model.output.name_to_position["t"]] == 0.0
    assert (per_var[sel] > 0).all()


def test_loss_variable_mapper_cross_variable_target(rng):
    """predicted vs target variables may name different columns (pairwise)."""
    idx = _wrapper_indices()
    pred = jnp.asarray(rng.normal(size=(1, 1, 1, 4, 3)), dtype=jnp.float32)
    target = jnp.asarray(rng.normal(size=(1, 1, 1, 4, 3)), dtype=jnp.float32)
    wrapped = get_loss_function(
        {"name": "LossVariableMapper", "predicted_variables": ["q"],
         "target_variables": ["t"],
         "loss": {"name": "WeightedMSELoss", "scalers": []}},
        {}, data_indices=idx,
    )
    pq = idx.model.output.name_to_position["q"]
    tt = idx.data.output.name_to_position["t"]
    expected = np.mean((np.asarray(pred)[..., pq] - np.asarray(target)[..., tt]) ** 2)
    np.testing.assert_allclose(float(wrapped(pred, target)), expected, rtol=1e-5)


def test_loss_variable_mapper_filters_variable_scalers(rng):
    """Variable-axis scalers sized to a full index space are subset to the
    selected variables (ref variable_mapper.py:112-135)."""
    idx = _wrapper_indices()
    var_w = jnp.asarray([2.0, 3.0, 5.0])  # model-output sized
    wrapped = get_loss_function(
        {"name": "LossVariableMapper", "predicted_variables": ["q", "tp"],
         "loss": {"name": "WeightedMSELoss", "scalers": ["vw"]}},
        {"vw": (("variable",), var_w)}, data_indices=idx,
    )
    inner_scaler = wrapped.loss.scalers.scalers["vw"][1]
    sel = [idx.model.output.name_to_position[n] for n in ("q", "tp")]
    np.testing.assert_allclose(np.asarray(inner_scaler), np.asarray(var_w)[sel])


def test_loss_variable_mapper_unknown_variable():
    idx = _wrapper_indices()
    with pytest.raises(ValueError, match="Cannot resolve"):
        get_loss_function(
            {"name": "LossVariableMapper", "predicted_variables": ["nope"],
             "loss": {"name": "WeightedMSELoss", "scalers": []}},
            {}, data_indices=idx,
        )


def test_time_aggregate_mean_minmax(rng):
    """mean/min/max aggregation collapses time before the inner loss
    (ref aggregate.py:135-148); result averages over aggregation types."""
    pred = jnp.asarray(rng.normal(size=(1, 4, 1, 5, 2)), dtype=jnp.float32)
    target = jnp.asarray(rng.normal(size=(1, 4, 1, 5, 2)), dtype=jnp.float32)
    wrapped = get_loss_function(
        {"name": "TimeAggregateLossWrapper",
         "time_aggregation_types": ["mean", "min", "max"],
         "loss": {"name": "WeightedMSELoss", "scalers": []}}, {},
    )
    p, t = np.asarray(pred), np.asarray(target)
    expected = 0.0
    for fn in (np.mean, np.min, np.max):
        expected += np.mean(
            (fn(p, axis=1, keepdims=True) - fn(t, axis=1, keepdims=True)) ** 2
        )
    expected /= 3.0
    np.testing.assert_allclose(float(wrapped(pred, target)), expected, rtol=1e-5)


def test_time_aggregate_diff_with_time_weights(rng):
    """diff aggregation scores per-step temporal differences, each step
    multiplied by the wrapped loss's time scaler (ref aggregate.py:150-166),
    which is excluded from the inner reduction."""
    pred = jnp.asarray(rng.normal(size=(1, 3, 1, 5, 1)), dtype=jnp.float32)
    target = jnp.asarray(rng.normal(size=(1, 3, 1, 5, 1)), dtype=jnp.float32)
    tw = jnp.asarray([0.5, 2.0])
    wrapped = get_loss_function(
        {"name": "TimeAggregateLossWrapper", "time_aggregation_types": ["diff"],
         "loss": {"name": "WeightedMSELoss", "scalers": ["tscale"]}},
        {"tscale": (("time",), tw)},
    )
    p, t = np.asarray(pred), np.asarray(target)
    dp, dt = p[:, 1:] - p[:, :-1], t[:, 1:] - t[:, :-1]
    expected = sum(
        float(tw[s]) * np.mean((dp[:, s] - dt[:, s]) ** 2) for s in range(2)
    )
    np.testing.assert_allclose(float(wrapped(pred, target)), expected, rtol=1e-5)


def test_time_aggregate_rejects_unknown_op():
    with pytest.raises(ValueError, match="Unknown aggregation"):
        get_loss_function(
            {"name": "TimeAggregateLossWrapper",
             "time_aggregation_types": ["median"],
             "loss": {"name": "WeightedMSELoss", "scalers": []}}, {},
        )


def test_variable_scaling_summary(tiny_graph):
    """Effective per-variable loss weighting (ref losses/utils.py:38)."""
    from anemoi_tpu.training.losses.base import variable_scaling_summary

    names = {"q": 0, "t_850": 1, "t_500": 2, "cos_lat": 3}
    idx = IndexCollection(names, forcing=["cos_lat"])
    scalers = create_scalers(
        {
            "var": {"name": "GeneralVariableLossScaler", "weights": {"q": 2.0}},
            "level": {"name": "ReluVariableLevelScaler", "slope": 0.001,
                      "y_intercept": 0.2},
        },
        data_indices=idx,
    )
    loss = get_loss_function(
        {"name": "WeightedMSELoss", "scalers": ["var", "level"]}, scalers
    )
    summary = variable_scaling_summary(loss, idx)
    np.testing.assert_allclose(summary["q"], 2.0)
    np.testing.assert_allclose(summary["t_850"], 0.85, atol=1e-6)
    np.testing.assert_allclose(summary["t_500"], 0.5, atol=1e-6)


def test_variable_mapper_units_check():
    """LossVariableMapper with cross-variable targets validates unit
    compatibility from variables_metadata (ref losses/utils.py:92)."""
    names = {"tp": 0, "imerg": 1, "2t": 2}
    idx = IndexCollection(names, diagnostic=[])
    vm = {"tp": {"units": "m"}, "imerg": {"units": "m"}, "2t": {"units": "K"}}
    cfg = {"name": "LossVariableMapper", "predicted_variables": ["tp"],
           "target_variables": ["imerg"], "target_layout": "data_output",
           "loss": {"name": "WeightedMSELoss"}}
    get_loss_function(dict(cfg), {}, data_indices=idx, variables_metadata=vm)
    bad = dict(cfg, target_variables=["2t"])
    with pytest.raises(ValueError, match="not compatible"):
        get_loss_function(bad, {}, data_indices=idx, variables_metadata=vm)
    # without metadata the check is skipped (warning only)
    get_loss_function(dict(bad), {}, data_indices=idx)

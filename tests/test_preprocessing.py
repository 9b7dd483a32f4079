"""Imputer family, postprocessors, stepwise chains -- mirrors the
reference's preprocessing test surface (models/tests/preprocessing/)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from anemoi_tpu.data_indices.collection import IndexCollection
from anemoi_tpu.preprocessing.imputer import (
    ConstantImputer,
    CopyImputer,
    InputImputer,
)
from anemoi_tpu.preprocessing.postprocessor import (
    ConditionalNaNPostprocessor,
    ConditionalZeroPostprocessor,
    NormalizedReluPostprocessor,
    Postprocessor,
)
from anemoi_tpu.preprocessing.processors import (
    StepwiseProcessors,
    build_processors,
    build_stepwise_processors,
)

NAMES = {"q": 0, "t": 1, "u": 2, "z": 3, "tp": 4, "cos_lat": 5}


@pytest.fixture
def indices():
    return IndexCollection(NAMES, forcing=["cos_lat", "z"], diagnostic=["tp"])


@pytest.fixture
def stats():
    return {
        "mean": np.arange(6, dtype=np.float32),
        "stdev": np.ones(6, np.float32) * 2.0,
        "minimum": -np.ones(6, np.float32),
        "maximum": np.ones(6, np.float32) * 10.0,
    }


def _batch(rng, nan_at=()):
    x = rng.normal(size=(2, 3, 1, 4, 6)).astype(np.float32)
    for b, g, v in nan_at:
        x[b, :, :, g, v] = np.nan
    return jnp.asarray(x)


def test_input_imputer_statistics(indices, stats, rng):
    imp = InputImputer(indices, stats, default="none",
                       methods={"mean": ["q"], "minimum": ["t"]})
    x = _batch(rng, nan_at=[(0, 1, 0), (1, 2, 1), (0, 3, 2)])
    y = np.asarray(imp.transform(x))
    assert y[0, 0, 0, 1, 0] == stats["mean"][0]
    assert y[1, 0, 0, 2, 1] == stats["minimum"][1]
    assert np.isnan(y[0, 0, 0, 3, 2])  # u has no method -> left NaN
    # non-NaN untouched
    np.testing.assert_array_equal(y[~np.isnan(np.asarray(x))],
                                  np.asarray(x)[~np.isnan(np.asarray(x))])


def test_constant_imputer_numeric_keys(indices, stats, rng):
    imp = ConstantImputer(indices, stats, default="none",
                          methods={3.5: ["q"], 0: ["u"]})
    x = _batch(rng, nan_at=[(0, 0, 0), (1, 1, 2)])
    y = np.asarray(imp.transform(x))
    assert y[0, 0, 0, 0, 0] == 3.5
    assert y[1, 0, 0, 1, 2] == 0.0


def test_copy_imputer(indices, stats, rng):
    imp = CopyImputer(indices, stats, default="none", methods={"t": ["q"]})
    x = _batch(rng, nan_at=[(0, 2, 0)])
    y = np.asarray(imp.transform(x))
    np.testing.assert_allclose(y[0, :, :, 2, 0], np.asarray(x)[0, :, :, 2, 1])


def test_imputer_model_input_space(indices, stats, rng):
    """Inference tensors (model-input width 5) are imputed too (ref
    transform :189 chooses indices by trailing dim)."""
    imp = InputImputer(indices, stats, default="none", methods={"mean": ["q"]})
    x = rng.normal(size=(1, 2, 1, 4, 5)).astype(np.float32)
    x[0, :, :, 0, 0] = np.nan  # q is model-input position 0
    y = np.asarray(imp.transform(jnp.asarray(x)))
    assert (y[0, :, :, 0, 0] == stats["mean"][0]).all()


def test_imputer_inverse_reinserts_nans(indices, stats, rng):
    imp = InputImputer(indices, stats, default="none", methods={"mean": ["q", "t"]})
    x = _batch(rng, nan_at=[(0, 1, 0), (1, 3, 1)])
    aux = imp.compute_aux(x)
    y_pred = jnp.asarray(rng.normal(size=(2, 1, 1, 4, 4)).astype(np.float32))
    y = np.asarray(imp.inverse_transform(y_pred, aux=aux))
    # q at (0, grid 1) and t at (1, grid 3) -> NaN in model output space
    assert np.isnan(y[0, 0, 0, 1, 0])
    assert np.isnan(y[1, 0, 0, 3, 1])
    assert np.isfinite(y[0, 0, 0, 0, 0])
    # without aux: identity
    np.testing.assert_array_equal(
        np.asarray(imp.inverse_transform(y_pred)), np.asarray(y_pred)
    )


def test_imputer_loss_mask(indices, stats, rng):
    imp = InputImputer(indices, stats, default="none", methods={"mean": ["q"]})
    x = _batch(rng, nan_at=[(0, 2, 0)])
    aux = imp.compute_aux(x)
    m = np.asarray(imp.loss_mask(aux))  # [B, G, V_out=4]
    assert m.shape == (2, 4, 4)
    assert m[0, 2, 0] == 0.0  # q imputed & NaN -> masked
    assert m[0, 2, 1] == 1.0
    assert m.sum() == 2 * 4 * 4 - 1


def test_loss_mask_zeroes_loss_contribution(indices, stats, rng):
    from anemoi_tpu.training.losses import get_loss_function

    loss = get_loss_function({"name": "WeightedMSELoss", "scalers": []}, {})
    pred = jnp.asarray(rng.normal(size=(1, 1, 1, 4, 4)).astype(np.float32))
    target = jnp.asarray(rng.normal(size=(1, 1, 1, 4, 4)).astype(np.float32))
    mask = jnp.ones((1, 4, 4)).at[0, 1, 2].set(0.0)
    full = float(loss(pred, target))
    masked = float(loss(pred, target, mask=mask))
    # equals the mean with that element dropped
    err = np.asarray((pred - target) ** 2)[0, 0, 0]
    expect = (err.sum() - err[1, 2]) / (err.size - 1)
    np.testing.assert_allclose(masked, expect, rtol=1e-5)
    assert masked != full


def test_postprocessor_functions(indices, stats, rng):
    pp = Postprocessor(indices, stats, methods={"relu": ["tp"], "hardtanh": ["q"]})
    y = jnp.asarray(rng.normal(size=(1, 1, 1, 4, 4)).astype(np.float32)) * 3.0
    out = np.asarray(pp.inverse_transform(y))
    assert (out[..., 3] >= 0).all()  # tp relu'd (output pos 3)
    assert (np.abs(out[..., 0]) <= 1).all()  # q hardtanh'd
    np.testing.assert_array_equal(out[..., 1], np.asarray(y)[..., 1])
    # transform is identity
    np.testing.assert_array_equal(np.asarray(pp.transform(y)), np.asarray(y))


def test_normalized_relu_postprocessor(indices, stats):
    pp = NormalizedReluPostprocessor(
        indices, stats, methods={-2.0: ["t"]}, normalizer="mean-std"
    )
    thr = (-2.0 - stats["mean"][1]) / stats["stdev"][1]
    y = jnp.full((1, 1, 1, 4, 4), -100.0)
    out = np.asarray(pp.inverse_transform(y))
    np.testing.assert_allclose(out[..., 1], thr, rtol=1e-6)
    np.testing.assert_array_equal(out[..., 0], -100.0)


def test_conditional_zero_postprocessor(indices, stats, rng):
    pp = ConditionalZeroPostprocessor(
        indices, stats, methods={0.0: ["q"], 5.0: ["u"]}, remap="tp"
    )
    y = np.asarray(rng.normal(size=(1, 1, 1, 4, 4)), dtype=np.float32)
    y[0, 0, 0, 2, 3] = 0.0  # tp == 0 at grid 2
    out = np.asarray(pp.inverse_transform(jnp.asarray(y)))
    assert out[0, 0, 0, 2, 0] == 0.0  # q zeroed
    assert out[0, 0, 0, 2, 2] == 5.0  # u set to 5
    assert out[0, 0, 0, 1, 0] == y[0, 0, 0, 1, 0]


def test_conditional_nan_postprocessor(indices, stats, rng):
    pp = ConditionalNaNPostprocessor(
        indices, stats, methods={"nan": ["q"]}, remap="tp"
    )
    y = np.asarray(rng.normal(size=(1, 1, 1, 4, 4)), dtype=np.float32)
    y[0, 0, 0, 1, 3] = np.nan  # tp NaN at grid 1
    out = np.asarray(pp.inverse_transform(jnp.asarray(y)))
    assert np.isnan(out[0, 0, 0, 1, 0])
    assert np.isfinite(out[0, 0, 0, 2, 0])


def test_build_processors_reference_style_config(indices, stats, rng):
    """Top-level method keys (the reference's YAML shape) fold into methods."""
    chain = build_processors(
        [{"name": "InputImputer", "default": "none", "mean": ["q"]},
         {"name": "InputNormalizer", "default": "mean-std"}],
        indices, stats,
    )
    assert chain.has_imputer
    x = _batch(rng, nan_at=[(0, 0, 0)])
    y = np.asarray(chain.transform(x))
    # q NaN was imputed with mean then normalised -> exactly 0 under mean-std
    np.testing.assert_allclose(y[0, :, :, 0, 0], 0.0, atol=1e-6)


def test_stepwise_processors(indices, stats):
    sw = build_stepwise_processors(
        {"6h": [{"name": "InputNormalizer", "default": "mean-std"}],
         "12h": None},
        indices, stats,
    )
    assert len(sw) == 2
    assert sw.lead_times == ["6h", "12h"]
    assert sw[0] is not None and sw[1] is None
    assert sw["6h"] is not None and sw["12h"] is None
    listed = list(sw)
    assert listed[1] is None
    x = jnp.ones((1, 1, 1, 2, 6))
    assert sw.transform(x, 1) is x  # missing step: identity
    assert not np.allclose(np.asarray(sw.transform(x, 0)), np.asarray(x))


def test_training_step_with_imputer_nan_inputs(tiny_graph, rng):
    """End to end: NaN inputs + imputer -> finite loss AND finite gradients
    (the imputer/loss coupling keeps imputed NaN targets out of the loss)."""
    from tests.test_models import make_indices, make_statistics
    from anemoi_tpu.models.interface import AnemoiModelInterface
    from anemoi_tpu.training.losses import get_loss_function
    from anemoi_tpu.training.optimizers import build_optimizer
    from anemoi_tpu.training.step import TrainState, make_step_fns

    cfg = {
        "model": {
            "name": "AnemoiModelEncProcDec",
            "num_channels": 16,
            "n_step_input": 2,
            "n_step_output": 1,
            "encoder": {"name": "GNNForwardMapper"},
            "processor": {"name": "PointWiseMLPProcessor", "num_layers": 1},
            "decoder": {"name": "GNNBackwardMapper"},
        },
        "data": {"processors": [
            {"name": "InputImputer", "default": "none", "mean": ["q", "t"]},
            {"name": "InputNormalizer", "default": "mean-std"},
        ]},
    }
    iface = AnemoiModelInterface(
        config=cfg, graph=tiny_graph,
        data_indices={"data": make_indices()},
        statistics={"data": make_statistics()},
    )
    params = iface.init_params(jax.random.PRNGKey(0))
    losses = {"data": get_loss_function({"name": "WeightedMSELoss", "scalers": []}, {})}
    tx = build_optimizer({"lr": {"rate": 1e-3, "warmup": 1, "iterations": 10}})
    state = TrainState.create(params, tx)
    train_step, eval_step = make_step_fns(iface, losses, rollout=1, remat_rollout=False)

    n_grid = tiny_graph["data"].num_nodes
    batch_np = rng.normal(size=(1, 3, 1, n_grid, 6)).astype(np.float32)
    batch_np[0, :, :, 0, 0] = np.nan  # q NaN at grid 0, all times
    state2, metrics = train_step(state, {"data": jnp.asarray(batch_np)})
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))
    m = eval_step(state2, {"data": jnp.asarray(batch_np)})
    assert np.isfinite(float(m["val_loss"]))

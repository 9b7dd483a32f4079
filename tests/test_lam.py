"""Limited-area (LAM) training: area masks + boundary forcing
(mirrors the reference's test_lam/test_stretched integration flavours)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from anemoi_tpu.training.masks import Boolean1DMask, NoOutputMask, build_output_masks
from anemoi_tpu.training.step import advance_input, _index_arrays
from tests.test_models import make_indices


def test_boolean_mask_apply():
    mask = Boolean1DMask(np.array([True, False, True]))
    x = jnp.ones((2, 3, 4))
    out = np.asarray(mask.apply(x))
    assert out[:, 0].sum() == 8 and out[:, 1].sum() == 0
    np.testing.assert_array_equal(mask.loss_scaler(), [1.0, 0.0, 1.0])


def test_boundary_forcing_in_advance(rng):
    idx = make_indices()
    ia = _index_arrays(idx)
    G, m = 6, 2
    x = jnp.asarray(rng.normal(size=(1, m, 1, G, 5)), dtype=jnp.float32)
    y_pred = jnp.asarray(rng.normal(size=(1, 1, 1, G, 4)), dtype=jnp.float32)
    batch = jnp.asarray(rng.normal(size=(1, 4, 1, G, 6)), dtype=jnp.float32)
    inside = jnp.asarray([True, True, True, False, False, False])

    adv = advance_input(x, y_pred, batch, 2, ia, boundary_mask=inside)
    new = np.asarray(adv[:, -1])  # [1, 1, G, 5]
    # inside nodes: prognostic (model-input idx 0..2) from prediction
    np.testing.assert_allclose(new[0, 0, 0, :3], np.asarray(y_pred)[0, 0, 0, 0, :3])
    # outside nodes: prognostics forced from the truth in the batch
    truth = np.asarray(batch)[0, 2, 0, 4]
    np.testing.assert_allclose(new[0, 0, 4, :3], truth[[0, 1, 2]])
    # forcings come from the batch everywhere (model-input idx 3,4 = z, cos_lat)
    np.testing.assert_allclose(new[0, 0, 0, 3], truth_like(batch, 0, 3))
    np.testing.assert_allclose(new[0, 0, 4, 3], np.asarray(batch)[0, 2, 0, 4, 3])


def truth_like(batch, g, data_idx):
    return np.asarray(batch)[0, 2, 0, g, data_idx]


def test_lam_training_with_mask(tmp_path):
    """End-to-end LAM-style training: cutout mask + masked loss + boundary
    forcing; loss decreases and the run completes."""
    from anemoi_tpu.training.trainer import AnemoiTrainer
    from tests.test_training import make_config

    cfg = make_config(tmp_path)
    # add an area mask attribute over the data nodes (lat > 0 = "the area")
    cfg["graph"]["recipe"]["nodes"]["data"]["attributes"]["inside"] = {
        "name": "AreaMask", "lat_min": 0.0,
    }
    cfg["training"]["output_mask"] = {
        "data": {"nodes_name": "data", "attribute_name": "inside"}
    }
    cfg["training"]["max_epochs"] = 1
    trainer = AnemoiTrainer(cfg, output_dir=cfg["output_dir"])
    assert "data" in trainer.output_masks
    assert "output_mask" in trainer.losses["data"].scalers.scalers
    result = trainer.train()
    assert np.isfinite(result["final_loss"])

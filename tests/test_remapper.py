"""Variable-expanding Remapper tests.

Mirrors the reference's preprocessing remapper behaviour
(/root/reference/models/src/anemoi/models/preprocessing/remapper.py:39):
a remapped variable is dropped from the layout, derived cos/sin variables are
appended, the IndexCollection and statistics are rewritten, and the inverse
reconstructs the original variable set.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from anemoi_tpu.data_indices import IndexCollection
from anemoi_tpu.preprocessing.remapper import Remapper

from tests.test_models import NAMES, make_statistics, model_config

CFG = {"cos_sin": {"u": ["cos_u", "sin_u"]}}


def make_indices():
    return IndexCollection(NAMES, forcing=["cos_lat", "z"], diagnostic=["tp"])


def test_index_rewrite():
    rm = Remapper(make_indices(), CFG)
    new = rm.data_indices
    # kept variables keep relative order, derived appended at the end
    assert list(new.name_to_index) == ["q", "t", "z", "tp", "cos_lat", "cos_u", "sin_u"]
    # u was prognostic -> both derived variables are prognostic
    assert "cos_u" in new.prognostic and "sin_u" in new.prognostic
    assert new.forcing == ["cos_lat", "z"] and new.diagnostic == ["tp"]
    assert new.num_model_input_vars == 6  # 2 forcing + 4 prognostic
    assert new.num_model_output_vars == 5  # 4 prognostic + 1 diagnostic


def test_transform_expands_and_statistics():
    idx = make_indices()
    rm = Remapper(idx, CFG)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 6)).astype(np.float32)
    x[..., NAMES["u"]] = rng.uniform(0, 360, size=(2, 3)).astype(np.float32)
    y = np.asarray(rm.transform(jnp.asarray(x)))
    assert y.shape == (2, 3, 7)
    # kept columns unchanged (new order q,t,z,tp,cos_lat)
    np.testing.assert_allclose(y[..., 0], x[..., NAMES["q"]])
    np.testing.assert_allclose(y[..., 2], x[..., NAMES["z"]])
    rad = np.deg2rad(x[..., NAMES["u"]])
    np.testing.assert_allclose(y[..., 5], np.cos(rad), rtol=1e-6)
    np.testing.assert_allclose(y[..., 6], np.sin(rad), rtol=1e-6)

    stats = rm.remap_statistics(make_statistics())
    for key in ("mean", "stdev", "minimum", "maximum"):
        assert stats[key].shape == (7,)
    assert stats["stdev"][5] == 1.0 and stats["mean"][6] == 0.0
    assert stats["minimum"][5] == -1.0 and stats["maximum"][6] == 1.0


def test_inverse_roundtrip():
    idx = make_indices()
    rm = Remapper(idx, CFG)
    rng = np.random.default_rng(1)
    # remapped model-output space: q,t,tp,cos_u,sin_u (5)
    names = rm.data_indices.model.output.ordered_names
    assert names == ["q", "t", "tp", "cos_u", "sin_u"]
    y = rng.normal(size=(4, 5)).astype(np.float32)
    ang = rng.uniform(0, 360, size=4).astype(np.float32)
    y[:, 3] = np.cos(np.deg2rad(ang))
    y[:, 4] = np.sin(np.deg2rad(ang))
    out = np.asarray(rm.inverse_transform(jnp.asarray(y)))
    # original model-output space: q,t,u,tp (4)
    assert idx.model.output.ordered_names == ["q", "t", "u", "tp"]
    assert out.shape == (4, 4)
    np.testing.assert_allclose(out[:, 0], y[:, 0])
    np.testing.assert_allclose(out[:, 3], y[:, 2])  # tp
    np.testing.assert_allclose(out[:, 2], ang, rtol=1e-4, atol=1e-3)  # u rebuilt


def test_interface_end_to_end(tiny_graph):
    """Interface built with a Remapper: model lives in remapped space,
    predict_step returns the ORIGINAL variable set."""
    from anemoi_tpu.models.interface import AnemoiModelInterface

    import jax

    config = {
        "model": model_config(),
        "data": {
            "processors": [
                {"name": "Remapper", "config": CFG},
                {"name": "InputNormalizer", "default": "mean-std"},
            ]
        },
    }
    iface = AnemoiModelInterface(
        config=config,
        graph=tiny_graph,
        data_indices={"data": make_indices()},
        statistics={"data": make_statistics()},
    )
    # interface indices are the remapped ones; model input width expanded
    assert iface.data_indices["data"].num_model_input_vars == 6
    params = iface.init_params(jax.random.PRNGKey(0))
    n_grid = tiny_graph["data"].num_nodes
    rng = np.random.default_rng(2)
    batch = rng.normal(size=(1, 2, 1, n_grid, 6)).astype(np.float32)
    batch[..., NAMES["u"]] = rng.uniform(0, 360, size=(1, 2, 1, n_grid)).astype(np.float32)
    out = iface.predict_step(params, {"data": jnp.asarray(batch)})
    # back in ORIGINAL model-output space: q,t,u,tp
    assert out["data"].shape == (1, 1, 1, n_grid, 4)
    u = np.asarray(out["data"])[..., 2]
    assert np.isfinite(np.asarray(out["data"])).all()
    assert (u >= 0.0).all() and (u < 360.0).all()  # angles re-folded to [0,360)

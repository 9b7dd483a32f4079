import numpy as np
import pytest

import jax
import jax.numpy as jnp

from anemoi_tpu.data_indices import IndexCollection
from anemoi_tpu.models.graph import build_model_graph
from anemoi_tpu.models.interface import AnemoiModelInterface

NAMES = {"q": 0, "t": 1, "u": 2, "z": 3, "tp": 4, "cos_lat": 5}


def make_indices():
    return IndexCollection(NAMES, forcing=["cos_lat", "z"], diagnostic=["tp"])


def model_config(processor="GNNProcessor", encoder="GNNForwardMapper", decoder="GNNBackwardMapper"):
    cfg = {
        "num_channels": 16,
        "n_step_input": 2,
        "n_step_output": 1,
        "latent_skip": True,
        "trainable_parameters": {"data": 2, "hidden": 2},
        "encoder": {"name": encoder, "sub_graph_edge_attributes": ["edge_dirs", "edge_length"]},
        "processor": {"name": processor, "num_layers": 2,
                      "sub_graph_edge_attributes": ["edge_dirs", "edge_length"]},
        "decoder": {"name": decoder, "sub_graph_edge_attributes": ["edge_dirs", "edge_length"]},
        "bounding": [{"name": "relu", "variables": ["tp"]}],
    }
    if processor == "GraphTransformerProcessor":
        cfg["processor"].update({"num_heads": 4, "mlp_hidden_ratio": 2.0})
    if encoder == "GraphTransformerForwardMapper":
        cfg["encoder"].update({"num_heads": 4, "mlp_hidden_ratio": 2.0})
    if decoder == "GraphTransformerBackwardMapper":
        cfg["decoder"].update({"num_heads": 4, "mlp_hidden_ratio": 2.0})
    return cfg


def make_statistics(n_vars=6):
    return {
        "mean": np.zeros(n_vars, dtype=np.float32),
        "stdev": np.ones(n_vars, dtype=np.float32),
        "minimum": -np.ones(n_vars, dtype=np.float32),
        "maximum": np.ones(n_vars, dtype=np.float32),
    }


def build_interface(tiny_graph, **cfg_kwargs):
    config = {
        "model": model_config(**cfg_kwargs),
        "data": {"processors": [{"name": "InputNormalizer", "default": "mean-std"}]},
    }
    return AnemoiModelInterface(
        config=config,
        graph=tiny_graph,
        data_indices={"data": make_indices()},
        statistics={"data": make_statistics()},
    )


@pytest.mark.parametrize(
    "flavour",
    [
        dict(),  # GNN everything
        dict(
            processor="GraphTransformerProcessor",
            encoder="GraphTransformerForwardMapper",
            decoder="GraphTransformerBackwardMapper",
        ),
    ],
    ids=["gnn", "graphtransformer"],
)
def test_forward_shapes(tiny_graph, flavour, rng):
    iface = build_interface(tiny_graph, **flavour)
    params = iface.init_params(jax.random.PRNGKey(0))
    n_grid = tiny_graph["data"].num_nodes
    x = {"data": jnp.asarray(rng.normal(size=(2, 2, 1, n_grid, 5)), dtype=jnp.float32)}
    out = iface.apply(params, x)
    assert out["data"].shape == (2, 1, 1, n_grid, 4)  # 4 model output vars
    assert np.isfinite(np.asarray(out["data"])).all()
    # bounding: tp (diagnostic, model-output index 3) must be >= 0
    tp_idx = make_indices().model.output.name_to_index["tp"]
    assert np.asarray(out["data"][..., tp_idx]).min() >= 0.0


def test_residual_connection_identity(tiny_graph, rng):
    """With zero-init trainable attrs the model at init should produce output
    close to the residual (prognostic part copies the last input step plus a
    small decoder perturbation)."""
    iface = build_interface(tiny_graph)
    params = iface.init_params(jax.random.PRNGKey(0))
    n_grid = tiny_graph["data"].num_nodes
    x = np.zeros((1, 2, 1, n_grid, 5), dtype=np.float32)
    x[..., :3] = rng.normal(size=(1, 2, 1, n_grid, 3))  # prognostic inputs
    out = iface.model.apply(params, {"data": jnp.asarray(x)})
    # prognostic output = residual + decoder output; check correlation with skip
    skip = x[:, -1, :, :, :3]
    pred = np.asarray(out["data"])[:, 0, :, :, :3]
    corr = np.corrcoef(skip.ravel(), pred.ravel())[0, 1]
    assert corr > 0.5, f"prognostic output should track the residual, corr={corr}"


def test_gradients_flow(tiny_graph, rng):
    iface = build_interface(tiny_graph)
    params = iface.init_params(jax.random.PRNGKey(0))
    n_grid = tiny_graph["data"].num_nodes
    x = {"data": jnp.asarray(rng.normal(size=(1, 2, 1, n_grid, 5)), dtype=jnp.float32)}

    def loss(p):
        out = iface.apply(p, x)
        return jnp.mean(out["data"] ** 2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # trainable node attributes must receive gradients
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    node_attr_grads = [
        np.abs(np.asarray(v)).sum() for k, v in flat if "node_attributes" in str(k)
    ]
    assert node_attr_grads and sum(node_attr_grads) > 0


def test_predict_step_denormalises(tiny_graph, rng):
    iface = build_interface(tiny_graph)
    params = iface.init_params(jax.random.PRNGKey(0))
    n_grid = tiny_graph["data"].num_nodes
    batch = {"data": jnp.asarray(rng.normal(size=(1, 2, 1, n_grid, 6)), dtype=jnp.float32)}
    out = iface.predict_step(params, batch)
    assert out["data"].shape == (1, 1, 1, n_grid, 4)
    assert np.isfinite(np.asarray(out["data"])).all()


def test_jit_forward(tiny_graph, rng):
    iface = build_interface(tiny_graph)
    params = iface.init_params(jax.random.PRNGKey(0))
    n_grid = tiny_graph["data"].num_nodes
    x = {"data": jnp.asarray(rng.normal(size=(1, 2, 1, n_grid, 5)), dtype=jnp.float32)}
    jitted = jax.jit(iface.model.apply)
    out1 = jitted(params, x, iface.graph_inputs)
    out2 = iface.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(out1["data"]), np.asarray(out2["data"]), atol=1e-5
    )

"""Hierarchical model tests: 2-level V-cycle on a small graph."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from anemoi_tpu.graphs.create import GraphCreator
from anemoi_tpu.models.interface import AnemoiModelInterface
from tests.test_models import make_indices, make_statistics


@pytest.fixture(scope="module")
def hier_graph():
    recipe = {
        "nodes": {
            "data": {"node_builder": {"name": "ReducedGaussianGridNodes", "grid": "o8"}},
            "hidden_1": {"node_builder": {"name": "TriNodes", "resolution": 2}},
            "hidden_2": {"node_builder": {"name": "TriNodes", "resolution": 1}},
        },
        "edges": [
            {"source_name": "data", "target_name": "hidden_1",
             "edge_builder": {"name": "CutOffEdges", "cutoff_factor": 0.9},
             "attributes": {"edge_length": {"name": "EdgeLength"},
                            "edge_dirs": {"name": "EdgeDirection"}}},
            {"source_name": "hidden_1", "target_name": "hidden_1",
             "edge_builder": {"name": "MultiScaleEdges", "x_hops": 1},
             "attributes": {"edge_length": {"name": "EdgeLength"},
                            "edge_dirs": {"name": "EdgeDirection"}}},
            {"source_name": "hidden_2", "target_name": "hidden_2",
             "edge_builder": {"name": "MultiScaleEdges", "x_hops": 1},
             "attributes": {"edge_length": {"name": "EdgeLength"},
                            "edge_dirs": {"name": "EdgeDirection"}}},
            {"source_name": "hidden_1", "target_name": "hidden_2",
             "edge_builder": {"name": "KNNEdges", "num_nearest_neighbours": 3},
             "attributes": {"edge_length": {"name": "EdgeLength"},
                            "edge_dirs": {"name": "EdgeDirection"}}},
            {"source_name": "hidden_2", "target_name": "hidden_1",
             "edge_builder": {"name": "KNNEdges", "num_nearest_neighbours": 3},
             "attributes": {"edge_length": {"name": "EdgeLength"},
                            "edge_dirs": {"name": "EdgeDirection"}}},
            {"source_name": "hidden_1", "target_name": "data",
             "edge_builder": {"name": "KNNEdges", "num_nearest_neighbours": 3},
             "attributes": {"edge_length": {"name": "EdgeLength"},
                            "edge_dirs": {"name": "EdgeDirection"}}},
        ],
    }
    return GraphCreator(recipe).create()


def test_hierarchical_forward(hier_graph, rng):
    cfg = {
        "name": "AnemoiModelEncProcDecHierarchical",
        "num_channels": 16,
        "n_step_input": 2,
        "n_step_output": 1,
        "hidden_names": ["hidden_1", "hidden_2"],
        "level_process": True,
        "trainable_parameters": {"data": 2, "hidden_1": 2, "hidden_2": 2},
        "encoder": {"name": "GNNForwardMapper"},
        "processor": {"name": "GraphTransformerProcessor", "num_layers": 1,
                      "num_heads": 4, "mlp_hidden_ratio": 2.0},
        "decoder": {"name": "GNNBackwardMapper"},
    }
    iface = AnemoiModelInterface(
        config={"model": cfg, "data": {"processors": []}},
        graph=hier_graph,
        data_indices={"data": make_indices()},
        statistics={"data": make_statistics()},
    )
    params = iface.init_params(jax.random.PRNGKey(0))
    n_grid = hier_graph["data"].num_nodes
    x = {"data": jnp.asarray(rng.normal(size=(1, 2, 1, n_grid, 5)), dtype=jnp.float32)}
    out = iface.apply(params, x)
    assert out["data"].shape == (1, 1, 1, n_grid, 4)
    assert np.isfinite(np.asarray(out["data"])).all()

    # gradients flow through all levels
    def loss(p):
        return jnp.mean(iface.apply(p, x)["data"] ** 2)

    grads = jax.grad(loss)(params)
    assert all(
        np.isfinite(np.asarray(g)).all() for g in jax.tree_util.tree_leaves(grads)
    )


def test_hierarchical_paged_backend_matches_padded(hier_graph, rng):
    """Hierarchy sub-graphs carry paged tables and match the padded path."""
    import copy

    from anemoi_tpu.models.interface import AnemoiModelInterface
    from anemoi_tpu.ops.pallas import paged_gt

    cfg = {
        "name": "AnemoiModelEncProcDecHierarchical",
        "num_channels": 16,
        "n_step_input": 2,
        "n_step_output": 1,
        "hidden_names": ["hidden_1", "hidden_2"],
        "level_process": True,
        "graph_attention_backend": "paged",
        "paged_block": [8, 16, 8],
        "paged_mapper_block": [8, 16, 8],
        "encoder": {"name": "GraphTransformerForwardMapper", "num_heads": 4,
                    "mlp_hidden_ratio": 2.0,
                    "sub_graph_edge_attributes": ["edge_length"]},
        "processor": {"name": "GraphTransformerProcessor", "num_layers": 1,
                      "num_heads": 4, "mlp_hidden_ratio": 2.0,
                      "sub_graph_edge_attributes": ["edge_length"]},
        "decoder": {"name": "GraphTransformerBackwardMapper", "num_heads": 4,
                    "mlp_hidden_ratio": 2.0,
                    "sub_graph_edge_attributes": ["edge_length"]},
    }
    common = dict(graph=hier_graph, data_indices={"data": make_indices()},
                  statistics={"data": make_statistics()})
    iface = AnemoiModelInterface(config={"model": cfg, "data": {"processors": []}},
                                 **common)
    params = iface.init_params(jax.random.PRNGKey(0))
    n_grid = hier_graph["data"].num_nodes
    x = {"data": jnp.asarray(rng.normal(size=(1, 2, 1, n_grid, 5)), jnp.float32)}
    gi = iface.graph_inputs
    assert gi["level"]["hidden_1"].paged_tables is not None
    assert gi["encoder"]["data"].paged_tables is not None

    paged_gt.set_interpret(True)
    try:
        out = iface.model.apply(params, x, gi)
    finally:
        paged_gt.set_interpret(False)

    cfg2 = copy.deepcopy(cfg)
    cfg2["graph_attention_backend"] = "padded"
    iface2 = AnemoiModelInterface(config={"model": cfg2, "data": {"processors": []}},
                                  **common)
    out2 = iface2.model.apply(params, x, iface2.graph_inputs)
    np.testing.assert_allclose(
        np.asarray(out["data"]), np.asarray(out2["data"]), rtol=3e-5, atol=3e-5
    )

"""Test configuration: force CPU with 8 virtual devices so sharding tests can
exercise a multi-chip `jax.sharding.Mesh` without TPU hardware (mirrors the
reference's gloo-on-CPU distributed test strategy, SURVEY.md §4.2)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def tiny_graph():
    """A small o16 -> icosphere-2 -> o16 graph, the shared model-test fixture
    (mirrors the reference's graph_with_nodes conftest fixture)."""
    from anemoi_tpu.graphs.create import GraphCreator

    recipe = {
        "nodes": {
            "data": {
                "node_builder": {"name": "ReducedGaussianGridNodes", "grid": "o16"},
                "attributes": {
                    "area_weight": {"name": "CosineLatWeightedAttribute", "norm": "unit-max"},
                },
            },
            "hidden": {
                "node_builder": {"name": "TriNodes", "resolution": 2},
            },
        },
        "edges": [
            {
                "source_name": "data",
                "target_name": "hidden",
                "edge_builder": {"name": "CutOffEdges", "cutoff_factor": 0.7},
                "attributes": {
                    "edge_length": {"name": "EdgeLength"},
                    "edge_dirs": {"name": "EdgeDirection"},
                },
            },
            {
                "source_name": "hidden",
                "target_name": "hidden",
                "edge_builder": {"name": "MultiScaleEdges", "x_hops": 1},
                "attributes": {
                    "edge_length": {"name": "EdgeLength"},
                    "edge_dirs": {"name": "EdgeDirection"},
                },
            },
            {
                "source_name": "hidden",
                "target_name": "data",
                "edge_builder": {"name": "KNNEdges", "num_nearest_neighbours": 3},
                "attributes": {
                    "edge_length": {"name": "EdgeLength"},
                    "edge_dirs": {"name": "EdgeDirection"},
                },
            },
        ],
    }
    return GraphCreator(recipe).create()

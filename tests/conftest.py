"""Test configuration: force CPU with 8 virtual devices so sharding tests can
exercise a multi-chip `jax.sharding.Mesh` without TPU hardware (mirrors the
reference's gloo-on-CPU distributed test strategy, SURVEY.md §4.2)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# amortise XLA CPU compile time across test runs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

import jax  # noqa: E402

# The ambient axon TPU plugin ignores JAX_PLATFORMS; jax.config is the only
# reliable way to pin the CPU backend (with 8 virtual devices for mesh tests).
jax.config.update("jax_platforms", "cpu")

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

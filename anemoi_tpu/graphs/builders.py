"""Compact subgraph builders + fused multi-dataset graph conventions.

Equivalents of /root/reference/graphs/src/anemoi/graphs/{builders.py:89-259,
projection_helpers.py:18-51}: one-call construction of the KNN projection,
truncation (data <-> coarse grid), and smoother (self-loop KNN) subgraphs used
by TruncatedConnection residuals, projection graph providers, and fused
multi-dataset models.  Edge weights are l1-normalised Gaussian distances under
the conventional attribute name ``gauss_weight``.
"""

from __future__ import annotations

from typing import Dict, List, Mapping, Optional, Set, Union

import numpy as np

from anemoi_tpu.graphs.graph import Graph, NodeSet

DEFAULT_DATASET_NAME = "data"
DEFAULT_EDGE_WEIGHT_ATTRIBUTE = "gauss_weight"
DEFAULT_GAUSSIAN_NORM = "l1"


def get_graph_node_names(graph_or_config: Union[Graph, Mapping]) -> Set[str]:
    """Node-type names visible in a built graph or a graph config
    (ref projection_helpers.py:24-36)."""
    if isinstance(graph_or_config, Graph):
        return set(graph_or_config.nodes)
    nodes = graph_or_config.get("nodes", {}) if graph_or_config else {}
    return set(nodes.keys()) if nodes else set()


def uses_fused_dataset_graph(
    graph_or_config: Union[Graph, Mapping], dataset_names: List[str]
) -> bool:
    """Whether the graph has one node group per dataset instead of a single
    generic ``data`` group (ref projection_helpers.py:39-51)."""
    if not dataset_names:
        return False
    node_names = get_graph_node_names(graph_or_config)
    if not set(dataset_names).issubset(node_names):
        return False
    return (
        dataset_names != [DEFAULT_DATASET_NAME]
        or DEFAULT_DATASET_NAME not in node_names
    )


def _knn_edge_cfg(src: str, dst: str, k: int, sigma: float) -> dict:
    return {
        "source_name": src,
        "target_name": dst,
        "edge_builder": {"name": "KNNEdges", "num_nearest_neighbours": int(k)},
        "attributes": {
            DEFAULT_EDGE_WEIGHT_ATTRIBUTE: {
                "name": "GaussianDistanceWeights",
                "sigma": float(sigma),
                "norm": DEFAULT_GAUSSIAN_NORM,
            }
        },
    }


def _target_nodes_cfg(config: Mapping) -> dict:
    node_builder = config.get("node_builder")
    if node_builder is None:
        grid = config.get("grid") or config.get("truncation_grid")
        if grid is None:
            raise ValueError("config must specify 'node_builder' or 'grid'")
        node_builder = {"name": "ReducedGaussianGridNodes", "grid": grid}
    return dict(node_builder)


def build_node_to_node_projection_subgraph(
    graph: Graph,
    source_node_name: str,
    target_node_name: str,
    config: Mapping,
) -> Graph:
    """KNN projection subgraph from source to target nodes with Gaussian
    edge weights (ref builders.py:89-146).

    Target coordinates are shared from ``graph`` when present, otherwise
    built from ``config['node_builder']`` / ``config['grid']``.
    ``num_nearest_neighbours`` and ``sigma`` are mandatory."""
    from anemoi_tpu.graphs.create import GraphCreator

    missing = [
        k for k in ("num_nearest_neighbours", "sigma") if config.get(k) is None
    ]
    if missing:
        raise ValueError(
            f"build_node_to_node_projection_subgraph requires config keys {missing}"
        )

    sub = Graph()
    sub[source_node_name] = NodeSet(coords=graph[source_node_name].coords)
    recipe = {
        "nodes": {},
        "edges": [
            _knn_edge_cfg(
                source_node_name,
                target_node_name,
                config["num_nearest_neighbours"],
                config["sigma"],
            )
        ],
    }
    if target_node_name == source_node_name:
        pass  # self-loop
    elif target_node_name in graph:
        sub[target_node_name] = NodeSet(coords=graph[target_node_name].coords)
    else:
        recipe["nodes"][target_node_name] = {
            "node_builder": _target_nodes_cfg(config)
        }
    return GraphCreator(recipe).update_graph(sub)


def build_truncation_subgraph(
    graph: Graph,
    data_node_name: str,
    truncation_config: Mapping,
) -> Graph:
    """Data nodes + a coarser ``truncation`` grid with KNN edges BOTH ways
    (down and up projections for TruncatedConnection; ref builders.py:148-208)."""
    from anemoi_tpu.graphs.create import GraphCreator

    k = int(truncation_config.get("num_nearest_neighbours", 3))
    sigma = float(truncation_config.get("sigma", 1.0))
    sub = Graph()
    sub[data_node_name] = NodeSet(coords=graph[data_node_name].coords)
    recipe = {
        "nodes": {"truncation": {"node_builder": _target_nodes_cfg(truncation_config)}},
        "edges": [
            _knn_edge_cfg(data_node_name, "truncation", k, sigma),
            _knn_edge_cfg("truncation", data_node_name, k, sigma),
        ],
    }
    return GraphCreator(recipe).update_graph(sub)


def build_smoother_subgraph(
    graph: Graph,
    data_node_name: str,
    smoother_config: Mapping,
) -> Graph:
    """Self-loop KNN smoother edges over the data nodes (ref builders.py:210-259)."""
    from anemoi_tpu.graphs.create import GraphCreator

    sub = Graph()
    sub[data_node_name] = NodeSet(coords=graph[data_node_name].coords)
    recipe = {
        "nodes": {},
        "edges": [
            _knn_edge_cfg(
                data_node_name,
                data_node_name,
                smoother_config["num_nearest_neighbours"],
                smoother_config["sigma"],
            )
        ],
    }
    return GraphCreator(recipe).update_graph(sub)

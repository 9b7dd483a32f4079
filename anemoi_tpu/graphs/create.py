"""Recipe-driven graph assembly.

Equivalent of /root/reference/graphs/src/anemoi/graphs/create.py:25-200
(`GraphCreator.update_graph/clean/post_process/save/create`).

Recipe format (YAML-friendly dict):

    nodes:
      data:
        node_builder: {name: ReducedGaussianGridNodes, grid: o32}
        attributes:
          area_weight: {name: SphericalAreaWeights, norm: unit-max}
      hidden:
        node_builder: {name: TriNodes, resolution: 3}
    edges:
      - source_name: data
        target_name: hidden
        edge_builder: {name: CutOffEdges, cutoff_factor: 0.6}
        attributes:
          edge_length: {name: EdgeLength}
          edge_dirs:   {name: EdgeDirection}
      - ...
    post_processors:
      - {name: SortEdgeIndexByDestinationNodes}

Edges are always dst-sorted at the end (the framework invariant), even if the
recipe omits the post-processor.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from anemoi_tpu.graphs.edges import build_edge_attribute, build_edges
from anemoi_tpu.graphs.graph import EdgeSet, Graph, NodeSet
from anemoi_tpu.graphs.nodes import build_node_attribute, build_nodes
from anemoi_tpu.graphs.post_process import apply_post_processor, sort_edges_by_dst


class GraphCreator:
    """Build a heterogeneous graph from a recipe config."""

    def __init__(self, config: Dict) -> None:
        self.config = config

    def update_graph(self, graph: Graph) -> Graph:
        for nodes_name, node_cfg in self.config.get("nodes", {}).items():
            coords = build_nodes(dict(node_cfg["node_builder"]), graph=graph)
            graph[nodes_name] = NodeSet(coords=np.asarray(coords, dtype=np.float64))
            for attr_name, attr_cfg in (node_cfg.get("attributes") or {}).items():
                graph[nodes_name].attributes[attr_name] = build_node_attribute(
                    graph, nodes_name, dict(attr_cfg)
                )

        for edge_cfg in self.config.get("edges", []):
            src = edge_cfg["source_name"]
            dst = edge_cfg["target_name"]
            builder_cfg = dict(edge_cfg["edge_builder"])
            builder_cfg.setdefault("source_name", src)
            builder_cfg.setdefault("target_name", dst)
            edge_index = build_edges(graph, builder_cfg)
            es = EdgeSet(edge_index=edge_index)
            for attr_name, attr_cfg in (edge_cfg.get("attributes") or {}).items():
                es.attributes[attr_name] = build_edge_attribute(
                    graph, src, dst, edge_index, dict(attr_cfg)
                )
            graph[(src, dst)] = es
        return graph

    def post_process(self, graph: Graph) -> Graph:
        for proc_cfg in self.config.get("post_processors", []):
            graph = apply_post_processor(graph, dict(proc_cfg))
        # framework invariant: edges dst-sorted with CSR pointers
        return sort_edges_by_dst(graph)

    def create(self, save_path: Optional[str] = None, overwrite: bool = False) -> Graph:
        import os

        if save_path and os.path.exists(save_path) and not overwrite:
            return Graph.load(save_path)
        graph = Graph()
        graph = self.update_graph(graph)
        graph = self.post_process(graph)
        if save_path:
            graph.save(save_path)
        return graph


def describe(graph: Graph) -> str:
    """Human-readable summary (equivalent of `anemoi-graphs describe`)."""
    lines = ["Graph summary", "============="]
    for name, ns in graph.nodes.items():
        lines.append(f"nodes '{name}': {ns.num_nodes} nodes")
        for attr, v in ns.attributes.items():
            lines.append(f"    attr '{attr}': shape {tuple(v.shape)} dtype {v.dtype}")
    for (src, dst), es in graph.edges.items():
        deg = es.num_edges / max(graph[dst].num_nodes, 1)
        lines.append(
            f"edges '{src}'->'{dst}': {es.num_edges} edges "
            f"(mean in-degree {deg:.1f}, dst_sorted={es.is_dst_sorted})"
        )
        for attr, v in es.attributes.items():
            lines.append(f"    attr '{attr}': shape {tuple(v.shape)} dtype {v.dtype}")
    return "\n".join(lines)

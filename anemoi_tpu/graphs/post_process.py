"""Graph post-processors.

Equivalents of /root/reference/graphs/src/anemoi/graphs/processors/post_process.py:
- sort_edges_by_dst (ref :245 BaseSortEdgeIndex) -- THE invariant downstream
  sharding and the Pallas CSC kernel rely on,
- remove_unconnected_nodes (ref :126),
- subset_nodes_in_area (ref :180).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from anemoi_tpu.graphs.graph import EdgeSet, Graph, NodeSet
from anemoi_tpu.utils.registry import Registry

post_processor_registry = Registry("graph post-processor")


@post_processor_registry.register("SortEdgeIndexByDestinationNodes")
def sort_edges_by_dst(graph: Graph) -> Graph:
    """Stably sort every edge set by destination node and attach CSR dst_ptr."""
    for key in list(graph.edges):
        _, dst_name = key
        graph.edges[key] = graph.edges[key].sort_by_dst(graph[dst_name].num_nodes)
    return graph


@post_processor_registry.register("SortEdgeIndexBySourceNodes")
def sort_edges_by_src(graph: Graph) -> Graph:
    """Stably sort edge sets by SOURCE node (ref post_process.py:290).
    Note: the framework re-sorts by destination at the end of post-processing
    (the CSR invariant); this exists for recipe parity/intermediate steps."""
    import numpy as np

    for key in list(graph.edges):
        es = graph.edges[key]
        order = np.argsort(es.edge_index[0], kind="stable")
        graph.edges[key] = EdgeSet(
            edge_index=es.edge_index[:, order],
            attributes={k: v[order] for k, v in es.attributes.items()},
        )
    return graph


@post_processor_registry.register("RemoveUnconnectedNodes")
def remove_unconnected_nodes(
    graph: Graph,
    nodes_name: str,
    ignore: Optional[str] = None,
    save_mask_indices_to_attr: Optional[str] = None,
) -> Graph:
    """Drop nodes of ``nodes_name`` with no incident edges and relabel all
    touching edge sets.  ``ignore``: name of a boolean attribute; True nodes
    are kept regardless."""
    ns = graph[nodes_name]
    connected = np.zeros(ns.num_nodes, dtype=bool)
    for (src, dst), es in graph.edges.items():
        if src == nodes_name:
            connected[es.edge_index[0]] = True
        if dst == nodes_name:
            connected[es.edge_index[1]] = True
    if ignore is not None:
        connected |= ns.attributes[ignore].reshape(-1).astype(bool)

    keep_idx = np.flatnonzero(connected)
    relabel = -np.ones(ns.num_nodes, dtype=np.int64)
    relabel[keep_idx] = np.arange(len(keep_idx))

    new_attrs = {k: v[keep_idx] for k, v in ns.attributes.items()}
    if save_mask_indices_to_attr:
        new_attrs[save_mask_indices_to_attr] = keep_idx[:, None]
    graph.nodes[nodes_name] = NodeSet(coords=ns.coords[keep_idx], attributes=new_attrs)

    for key in list(graph.edges):
        src, dst = key
        es = graph.edges[key]
        ei = es.edge_index.copy()
        mask = np.ones(es.num_edges, dtype=bool)
        if src == nodes_name:
            ei[0] = relabel[ei[0]]
            mask &= ei[0] >= 0
        if dst == nodes_name:
            ei[1] = relabel[ei[1]]
            mask &= ei[1] >= 0
        if src == nodes_name or dst == nodes_name:
            graph.edges[key] = EdgeSet(
                edge_index=ei[:, mask],
                attributes={k: v[mask] for k, v in es.attributes.items()},
            )
    return graph


@post_processor_registry.register("SubsetNodesInArea")
def subset_nodes_in_area(
    graph: Graph,
    nodes_name: str,
    lat_min: float = -90.0,
    lat_max: float = 90.0,
    lon_min: float = -180.0,
    lon_max: float = 180.0,
) -> Graph:
    """Keep only nodes inside a lat/lon box, relabelling touching edges."""
    ns = graph[nodes_name]
    deg = np.rad2deg(ns.coords)
    keep = (
        (deg[:, 0] >= lat_min)
        & (deg[:, 0] <= lat_max)
        & (deg[:, 1] >= lon_min)
        & (deg[:, 1] <= lon_max)
    )
    keep_idx = np.flatnonzero(keep)
    relabel = -np.ones(ns.num_nodes, dtype=np.int64)
    relabel[keep_idx] = np.arange(len(keep_idx))
    graph.nodes[nodes_name] = NodeSet(
        coords=ns.coords[keep_idx],
        attributes={k: v[keep_idx] for k, v in ns.attributes.items()},
    )
    for key in list(graph.edges):
        src, dst = key
        es = graph.edges[key]
        if src != nodes_name and dst != nodes_name:
            continue
        ei = es.edge_index.copy()
        mask = np.ones(es.num_edges, dtype=bool)
        if src == nodes_name:
            ei[0] = relabel[ei[0]]
            mask &= ei[0] >= 0
        if dst == nodes_name:
            ei[1] = relabel[ei[1]]
            mask &= ei[1] >= 0
        graph.edges[key] = EdgeSet(
            edge_index=ei[:, mask],
            attributes={k: v[mask] for k, v in es.attributes.items()},
        )
    return graph


def apply_post_processor(graph: Graph, config: dict) -> Graph:
    return post_processor_registry.build_from_config(config, graph=graph)


def _relabel_nodes(graph: Graph, nodes_name: str, order: np.ndarray) -> Graph:
    """Permute a node set (and every touching edge set) so that new position
    ``i`` holds old node ``order[i]``.  Pure relabeling."""
    ns = graph[nodes_name]
    relabel = np.empty(ns.num_nodes, dtype=np.int64)
    relabel[order] = np.arange(ns.num_nodes)

    graph.nodes[nodes_name] = NodeSet(
        coords=ns.coords[order],
        attributes={k: v[order] for k, v in ns.attributes.items()},
    )
    for ekey in list(graph.edges):
        src, dst = ekey
        if src != nodes_name and dst != nodes_name:
            continue
        e = graph.edges[ekey]
        ei = e.edge_index.copy()
        if src == nodes_name:
            ei[0] = relabel[ei[0]]
        if dst == nodes_name:
            ei[1] = relabel[ei[1]]
        graph.edges[ekey] = EdgeSet(edge_index=ei, attributes=dict(e.attributes))
    return graph


@post_processor_registry.register("SortNodesBySpaceFillingCurve")
def sort_nodes_by_space_filling_curve(graph: Graph, nodes_name: str) -> Graph:
    """Relabel ``nodes_name`` along a cube-sphere Morton curve so nearby nodes
    get nearby indices.  This is what makes the paged Pallas GT-attention
    kernel's (dst-block, src-page) slot tables dense (ops/pallas/paged_gt.py):
    each destination block then draws its neighbours from a handful of source
    pages.  TPU-specific; apply BEFORE the dst-sort post-processor."""
    from anemoi_tpu.graphs.ordering import cube_morton_order

    coords = graph[nodes_name].coords
    order = cube_morton_order(np.rad2deg(coords[:, 0]), np.rad2deg(coords[:, 1]))
    return _relabel_nodes(graph, nodes_name, order)


@post_processor_registry.register("SortNodesByIncomingDegree")
def sort_nodes_by_incoming_degree(
    graph: Graph, nodes_name: str, edges_key: Optional[list] = None
) -> Graph:
    """Relabel ``nodes_name`` by DESCENDING in-degree of one of its edge sets
    (default: the self-edges).  Pure relabeling: coordinates, attributes and
    every touching edge set are permuted consistently.  Enables degree-bucketed
    gather tables (ops.padded.compute_buckets) that cut the padded gather
    volume ~2x on skewed meshes.  Apply BEFORE the dst-sort post-processor."""
    key = tuple(edges_key) if edges_key else (nodes_name, nodes_name)
    es = graph[key]
    ns = graph[nodes_name]
    deg = np.bincount(es.edge_index[1], minlength=ns.num_nodes)
    order = np.argsort(-deg, kind="stable")  # old id per new position
    return _relabel_nodes(graph, nodes_name, order)

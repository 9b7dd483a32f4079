"""Edge builders and edge attributes.

Equivalents of /root/reference/graphs/src/anemoi/graphs/edges/builders/* and
edges/attributes.py (SURVEY.md §2.1).  Distance queries run on unit-sphere
cartesian coordinates with sklearn BallTree/NearestNeighbors, mirroring the
reference's sklearn backend (edges/builders/cutoff.py:201).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
from sklearn.neighbors import NearestNeighbors

from anemoi_tpu.graphs.generate.icosahedron import multi_scale_edge_index
from anemoi_tpu.graphs.graph import Graph
from anemoi_tpu.graphs.nodes import normalise
from anemoi_tpu.graphs.transforms import (
    azimuth,
    edge_directions,
    great_circle_distance,
    latlon_rad_to_xyz,
)
from anemoi_tpu.utils.registry import Registry

edge_builder_registry = Registry("edge builder")
edge_attribute_registry = Registry("edge attribute")

EARTH_RADIUS_KM = 6371.0


def _reference_distance(coords: np.ndarray) -> float:
    """Max nearest-neighbour chord distance among nodes -- the 'grid reference
    distance' used to scale cutoff radii (ref: cutoff.py:99-121)."""
    xyz = latlon_rad_to_xyz(coords)
    nn = NearestNeighbors(n_neighbors=2).fit(xyz)
    dist, _ = nn.kneighbors(xyz)
    return float(dist[:, 1].max())


@edge_builder_registry.register("CutOffEdges")
def cutoff_edges(
    graph: Graph,
    source_name: str,
    target_name: str,
    cutoff_factor: Optional[float] = None,
    cutoff_distance_km: Optional[float] = None,
    max_num_neighbours: int = 64,
) -> np.ndarray:
    """Connect each target node to all source nodes within a cutoff radius.

    Radius = cutoff_factor * target grid reference distance, or an explicit
    km distance (ref: edges/builders/cutoff.py:32-160).
    """
    if (cutoff_factor is None) == (cutoff_distance_km is None):
        raise ValueError("Provide exactly one of cutoff_factor / cutoff_distance_km.")
    src_xyz = latlon_rad_to_xyz(graph[source_name].coords)
    dst_xyz = latlon_rad_to_xyz(graph[target_name].coords)
    if cutoff_distance_km is not None:
        radius = 2.0 * np.sin(cutoff_distance_km / EARTH_RADIUS_KM / 2.0)  # arc -> chord
    else:
        radius = cutoff_factor * _reference_distance(graph[target_name].coords)
    nn = NearestNeighbors(n_neighbors=max_num_neighbours).fit(src_xyz)
    dist, idx = nn.kneighbors(dst_xyz)
    within = dist <= radius
    dst = np.repeat(np.arange(len(dst_xyz)), within.sum(axis=1))
    src = idx[within]
    return np.stack([src, dst]).astype(np.int64)


@edge_builder_registry.register("KNNEdges")
def knn_edges(graph: Graph, source_name: str, target_name: str, num_nearest_neighbours: int = 3) -> np.ndarray:
    """Connect each target node to its k nearest source nodes (ref: knn.py:24)."""
    src_xyz = latlon_rad_to_xyz(graph[source_name].coords)
    dst_xyz = latlon_rad_to_xyz(graph[target_name].coords)
    nn = NearestNeighbors(n_neighbors=num_nearest_neighbours).fit(src_xyz)
    _, idx = nn.kneighbors(dst_xyz)
    dst = np.repeat(np.arange(len(dst_xyz)), num_nearest_neighbours)
    return np.stack([idx.ravel(), dst]).astype(np.int64)


@edge_builder_registry.register("ReversedKNNEdges")
def reversed_knn_edges(graph: Graph, source_name: str, target_name: str, num_nearest_neighbours: int = 3) -> np.ndarray:
    """Each SOURCE node connects to its k nearest target nodes (ref: knn.py:88)."""
    src_xyz = latlon_rad_to_xyz(graph[source_name].coords)
    dst_xyz = latlon_rad_to_xyz(graph[target_name].coords)
    nn = NearestNeighbors(n_neighbors=num_nearest_neighbours).fit(dst_xyz)
    _, idx = nn.kneighbors(src_xyz)
    src = np.repeat(np.arange(len(src_xyz)), num_nearest_neighbours)
    return np.stack([src, idx.ravel()]).astype(np.int64)


@edge_builder_registry.register("MutualKNNEdges")
def mutual_knn_edges(graph: Graph, source_name: str, target_name: str, num_nearest_neighbours: int = 3) -> np.ndarray:
    """Keep only edges that are kNN in both directions (ref: knn.py:133)."""
    fwd = knn_edges(graph, source_name, target_name, num_nearest_neighbours)
    rev = reversed_knn_edges(graph, source_name, target_name, num_nearest_neighbours)
    fwd_set = set(map(tuple, fwd.T.tolist()))
    keep = [i for i, e in enumerate(rev.T.tolist()) if tuple(e) in fwd_set]
    return rev[:, keep]


@edge_builder_registry.register("HEALPixMultiScaleEdges")
def healpix_multi_scale_edges(
    graph: Graph,
    source_name: str,
    target_name: str,
    scale_resolutions=None,
    resolution: Optional[int] = None,
) -> np.ndarray:
    """HEALPix multi-scale mesh edges (ref: edges/builders/healpix.py:21-60).

    Requires nested-scheme ``HEALPixNodes``; unions the 8-neighbour pixel
    adjacency over ``scale_resolutions`` with coarse indices mapped to their
    first fine descendant (nested index * 4^(res_diff))."""
    from anemoi_tpu.graphs.generate.healpix import healpix_multiscale_edges

    assert source_name == target_name, (
        "HEALPixMultiScaleEdges connect a node set to itself."
    )
    num_nodes = graph[source_name].num_nodes
    if resolution is None:
        r = int(round(np.log(num_nodes / 12.0) / np.log(4.0)))
        assert 12 * 4**r == num_nodes, (
            f"Cannot infer HEALPix resolution from {num_nodes} nodes; pass resolution="
        )
        resolution = r
    return healpix_multiscale_edges(resolution, scale_resolutions)


@edge_builder_registry.register("ICONTopologicalProcessorEdges")
def icon_processor_edges(
    graph: Graph,
    source_name: str,
    target_name: str,
    grid_filename: str,
    max_level: Optional[int] = None,
    bidirectional: bool = True,
) -> np.ndarray:
    """Multimesh vertex-vertex edges unioned over refinement levels
    0..max_level (ref edges/builders/icon.py:24-53).  The node set must be
    ``ICONMultiMeshNodes`` built from the same grid file/max_level."""
    from anemoi_tpu.graphs.generate.icon import icon_multimesh

    assert source_name == target_name, "ICON processor edges connect the multimesh to itself."
    mesh = icon_multimesh(grid_filename, max_level)
    assert mesh.num_nodes == graph[source_name].num_nodes, (
        f"'{source_name}' has {graph[source_name].num_nodes} nodes but the ICON "
        f"multimesh at max_level={max_level} has {mesh.num_nodes}; build the "
        "nodes with ICONMultiMeshNodes from the same grid_filename/max_level."
    )
    return mesh.multi_mesh_edges(bidirectional=bidirectional)


def _icon_grid2mesh(graph, cell_name, mesh_name, grid_filename, max_level, cell_max_level):
    from anemoi_tpu.graphs.generate.icon import icon_grid2mesh_edges, icon_multimesh

    pairs = icon_grid2mesh_edges(grid_filename, max_level, cell_max_level)
    mesh = icon_multimesh(grid_filename, max_level)
    assert mesh.num_nodes == graph[mesh_name].num_nodes
    assert int(pairs[:, 0].max()) + 1 == graph[cell_name].num_nodes, (
        f"'{cell_name}' must be ICONCellGridNodes from the same grid file"
    )
    return pairs


@edge_builder_registry.register("ICONTopologicalEncoderEdges")
def icon_encoder_edges(
    graph: Graph,
    source_name: str,
    target_name: str,
    grid_filename: str,
    max_level: Optional[int] = None,
    cell_max_level: Optional[int] = None,
) -> np.ndarray:
    """Cell -> multimesh-vertex edges: each ICON cell connects to the 3
    vertices of its level-``max_level`` ancestor triangle (ref
    edges/builders/icon.py:77-85; icon_mesh.py:295-304)."""
    pairs = _icon_grid2mesh(graph, source_name, target_name, grid_filename, max_level, cell_max_level)
    return pairs.T.astype(np.int64)


@edge_builder_registry.register("ICONTopologicalDecoderEdges")
def icon_decoder_edges(
    graph: Graph,
    source_name: str,
    target_name: str,
    grid_filename: str,
    max_level: Optional[int] = None,
    cell_max_level: Optional[int] = None,
) -> np.ndarray:
    """Multimesh-vertex -> cell edges (the encoder edges reversed; ref
    edges/builders/icon.py:88-96)."""
    pairs = _icon_grid2mesh(graph, target_name, source_name, grid_filename, max_level, cell_max_level)
    return pairs[:, ::-1].T.astype(np.int64)


@edge_builder_registry.register("MultiScaleEdges")
def multi_scale_edges(
    graph: Graph,
    source_name: str,
    target_name: str,
    x_hops: int = 1,
    resolution: Optional[int] = None,
    scale_resolutions: Optional[list] = None,
    mesh_type: Optional[str] = None,
    depth_children: int = 0,
) -> np.ndarray:
    """Icosahedral multi-scale mesh edges (ref: multi_scale.py:23).

    Works over ``TriNodes`` (vertex mesh, 10*4^r+2 nodes) and ``HexNodes``
    (dual mesh, 20*4^r nodes; ref dispatches on the node builder class,
    multi_scale.py:40-54); the mesh type is inferred from the node count
    unless ``mesh_type`` ('tri'|'hex') is given.  Coarse-level adjacency is
    unioned across ``scale_resolutions``; ``depth_children`` (hex only) adds
    parent-child cross-level edges like the reference's h3 builder.
    """
    assert source_name == target_name, "MultiScaleEdges connect a node set to itself."
    num_nodes = graph[source_name].num_nodes
    if mesh_type is None or resolution is None:
        r_tri = int(round(np.log(max(num_nodes - 2, 1) / 10.0) / np.log(4.0)))
        r_hex = int(round(np.log(max(num_nodes, 1) / 20.0) / np.log(4.0)))
        if mesh_type == "tri" or (mesh_type is None and 10 * 4**r_tri + 2 == num_nodes):
            mesh_type, resolution = "tri", (resolution if resolution is not None else r_tri)
        elif mesh_type == "hex" or (mesh_type is None and 20 * 4**r_hex == num_nodes):
            mesh_type, resolution = "hex", (resolution if resolution is not None else r_hex)
        else:
            raise ValueError(
                f"Cannot infer tri/hex mesh resolution from {num_nodes} nodes; "
                "pass mesh_type= and resolution="
            )
    # edge indices are generated for the full mesh at `resolution`; a node set
    # of any other size would silently get out-of-range / wrong-mesh edges
    expected = 10 * 4**resolution + 2 if mesh_type == "tri" else 20 * 4**resolution
    assert expected == num_nodes, (
        f"MultiScaleEdges: node set '{source_name}' has {num_nodes} nodes but a "
        f"{mesh_type} mesh at resolution {resolution} has {expected}"
    )
    if mesh_type == "hex":
        from anemoi_tpu.graphs.generate.hexagons import hex_multi_scale_edge_index

        return hex_multi_scale_edge_index(resolution, scale_resolutions, x_hops, depth_children)
    assert depth_children == 0, "depth_children applies to hex meshes only"
    return multi_scale_edge_index(resolution, scale_resolutions, x_hops)


# ----------------------------------------------------------------------
# Edge attributes (ref: graphs/src/anemoi/graphs/edges/attributes.py)
# ----------------------------------------------------------------------
def _edge_coords(graph: Graph, source_name: str, target_name: str, edge_index: np.ndarray):
    src = graph[source_name].coords[edge_index[0]]
    dst = graph[target_name].coords[edge_index[1]]
    return src, dst


@edge_attribute_registry.register("EdgeLength")
def edge_length(
    graph: Graph, source_name: str, target_name: str, edge_index: np.ndarray, norm: Optional[str] = "unit-max"
) -> np.ndarray:
    """Great-circle length per edge (ref: attributes.py:87)."""
    src, dst = _edge_coords(graph, source_name, target_name, edge_index)
    d = great_circle_distance(src, dst)
    return normalise(d.astype(np.float32)[:, None], norm)


@edge_attribute_registry.register("EdgeDirection")
def edge_direction(
    graph: Graph, source_name: str, target_name: str, edge_index: np.ndarray, norm: Optional[str] = "unit-std"
) -> np.ndarray:
    """(dlat, dlon) of the source in the destination's local frame (ref: attributes.py:95)."""
    src, dst = _edge_coords(graph, source_name, target_name, edge_index)
    d = edge_directions(src, dst)
    return normalise(d.astype(np.float32), norm)


@edge_attribute_registry.register("Azimuth")
def edge_azimuth(
    graph: Graph, source_name: str, target_name: str, edge_index: np.ndarray, norm: Optional[str] = None
) -> np.ndarray:
    """Forward azimuth src->dst (ref: attributes.py:143)."""
    src, dst = _edge_coords(graph, source_name, target_name, edge_index)
    a = azimuth(src, dst)
    return normalise(a.astype(np.float32)[:, None], norm)


@edge_attribute_registry.register("GaussianDistanceWeights")
def gaussian_distance_weights(
    graph: Graph,
    source_name: str,
    target_name: str,
    edge_index: np.ndarray,
    sigma_factor: Optional[float] = None,
    sigma: Optional[float] = None,
    norm: Optional[str] = None,
) -> np.ndarray:
    """exp(-d^2 / (2 sigma^2)) (ref: attributes.py:363-375).

    ``sigma`` is absolute (the reference's parameter); ``sigma_factor``
    scales the mean edge length instead.  Default: sigma_factor=1."""
    src, dst = _edge_coords(graph, source_name, target_name, edge_index)
    d = great_circle_distance(src, dst)
    if sigma is None:
        sigma = (sigma_factor if sigma_factor is not None else 1.0) * max(
            float(d.mean()), 1e-12
        )
    w = np.exp(-0.5 * (d / sigma) ** 2).astype(np.float64)
    # the reference normalises PER TARGET NODE (norm_by_group=True,
    # attributes.py:366): a projection matrix needs unit row sums
    if norm == "l1":
        dst = edge_index[1]
        sums = np.zeros(graph[target_name].num_nodes, dtype=np.float64)
        np.add.at(sums, dst, w)
        w = w / np.maximum(sums[dst], 1e-30)
        return w.astype(np.float32)[:, None]
    return normalise(w.astype(np.float32)[:, None], norm)


@edge_attribute_registry.register("RadialBasisFeatures")
def radial_basis_features(
    graph: Graph,
    source_name: str,
    target_name: str,
    edge_index: np.ndarray,
    num_basis: int = 8,
    norm: Optional[str] = None,
) -> np.ndarray:
    """Gaussian RBF expansion of the edge length (ref: attributes.py:216)."""
    src, dst = _edge_coords(graph, source_name, target_name, edge_index)
    d = great_circle_distance(src, dst)
    d_max = max(float(d.max()), 1e-12)
    centres = np.linspace(0.0, d_max, num_basis)
    width = d_max / max(num_basis - 1, 1)
    feats = np.exp(-0.5 * ((d[:, None] - centres[None, :]) / width) ** 2)
    return normalise(feats.astype(np.float32), norm)


@edge_attribute_registry.register("DirectionalHarmonics")
def directional_harmonics(
    graph: Graph,
    source_name: str,
    target_name: str,
    edge_index: np.ndarray,
    num_harmonics: int = 2,
    norm: Optional[str] = None,
) -> np.ndarray:
    """sin/cos harmonics of the edge azimuth (ref: attributes.py:103)."""
    src, dst = _edge_coords(graph, source_name, target_name, edge_index)
    a = azimuth(src, dst)
    feats = []
    for k in range(1, num_harmonics + 1):
        feats.append(np.sin(k * a))
        feats.append(np.cos(k * a))
    return normalise(np.stack(feats, axis=-1).astype(np.float32), norm)


def build_edges(graph: Graph, config: Dict) -> np.ndarray:
    return edge_builder_registry.build_from_config(config, graph=graph)


def build_edge_attribute(
    graph: Graph, source_name: str, target_name: str, edge_index: np.ndarray, config: Dict
) -> np.ndarray:
    return edge_attribute_registry.build_from_config(
        config, graph=graph, source_name=source_name, target_name=target_name, edge_index=edge_index
    )

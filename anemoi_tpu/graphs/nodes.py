"""Node builders and node attributes.

Equivalents of /root/reference/graphs/src/anemoi/graphs/nodes/builders/* and
nodes/attributes/* (SURVEY.md §2.1), registry-driven instead of hydra-driven.

All builders return ``(lat, lon)`` coordinates in radians; attributes return
``[N, k]`` float arrays (or bool masks).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
from scipy.spatial import SphericalVoronoi

from anemoi_tpu.graphs.generate.gaussian import (
    full_gaussian_grid,
    octahedral_gaussian_grid,
    reduced_gaussian_grid,
    regular_latlon_grid,
)
from anemoi_tpu.graphs.generate.healpix import healpix_grid
from anemoi_tpu.graphs.generate.icosahedron import create_tri_nodes
from anemoi_tpu.graphs.graph import Graph, NodeSet
from anemoi_tpu.graphs.transforms import latlon_rad_to_xyz
from anemoi_tpu.utils.registry import Registry

node_builder_registry = Registry("node builder")
node_attribute_registry = Registry("node attribute")

EARTH_RADIUS_KM = 6371.0


# ----------------------------------------------------------------------
# Normalisation (mirror of graphs/src/anemoi/graphs/normalise.py)
# ----------------------------------------------------------------------
def normalise(values: np.ndarray, norm: Optional[str]) -> np.ndarray:
    if norm is None or norm == "none":
        return values
    if norm == "l1":
        return values / np.sum(values)
    if norm == "l2":
        return values / np.linalg.norm(values)
    if norm == "unit-max":
        return values / np.amax(values)
    if norm == "unit-range":
        lo, hi = np.amin(values), np.amax(values)
        rng = hi - lo if hi > lo else 1.0
        return (values - lo) / rng
    if norm == "unit-std":
        std = np.std(values)
        return values if std == 0 else values / std
    raise ValueError(f"Unknown norm '{norm}'")


# ----------------------------------------------------------------------
# Node builders
# ----------------------------------------------------------------------
@node_builder_registry.register("LatLonNodes")
def latlon_nodes(latitudes, longitudes, units: str = "deg") -> np.ndarray:
    """Nodes from explicit coordinate vectors (ref: from_vectors.py:21)."""
    lat = np.asarray(latitudes, dtype=np.float64)
    lon = np.asarray(longitudes, dtype=np.float64)
    coords = np.stack([lat, lon], axis=-1)
    if units == "deg":
        coords = np.deg2rad(coords)
    return coords


@node_builder_registry.register("NPZFileNodes")
def npz_file_nodes(npz_file: str, lat_key: str = "latitudes", lon_key: str = "longitudes") -> np.ndarray:
    """Nodes from an .npz file with lat/lon arrays (ref: from_file.py:98)."""
    data = np.load(npz_file)
    return latlon_nodes(data[lat_key], data[lon_key])


@node_builder_registry.register("TextNodes")
def text_nodes(dataset: str, idx_lon: int = 0, idx_lat: int = 1) -> np.ndarray:
    """Nodes from a whitespace text file of coordinates, one ROW per
    coordinate (ref from_file.py:66 TextNodes: np.loadtxt + row indices
    idx_lat/idx_lon select the latitude/longitude rows, degrees)."""
    data = np.loadtxt(dataset)
    if data.ndim == 1:
        data = data[:, None]
    return latlon_nodes(data[idx_lat, :], data[idx_lon, :])


@node_builder_registry.register("XArrayNodes")
def xarray_nodes(
    dataset: str,
    lat_key: str = "lat",
    lon_key: str = "lon",
    layout: Optional[str] = None,
) -> np.ndarray:
    """Nodes from coordinate variables of a NetCDF file (ref from_file.py:202
    XArrayNodes; same 'lat'/'lon' key defaults).  xarray is not in this
    image, so classic NetCDF-3 files are read via scipy.

    ``layout``: "grid" treats 1-D lat/lon vectors as regular-grid axes
    (meshgrid), "points" as paired per-point coordinates; default infers
    "points" when the vectors have equal length, "grid" otherwise.
    Degrees are assumed unless a variable's ``units`` attribute says radian
    (checked on both variables; mixed units are rejected)."""
    from scipy.io import netcdf_file

    def _is_radian(var) -> bool:
        units = getattr(var, "units", b"")
        return b"radian" in units if isinstance(units, bytes) else "radian" in units

    with netcdf_file(dataset, "r", mmap=False) as nc:
        for key in (lat_key, lon_key):
            if key not in nc.variables:
                raise KeyError(
                    f"Coordinate variable '{key}' not in {dataset}; available: "
                    f"{sorted(nc.variables)} (pass lat_key=/lon_key=)"
                )
        vlat, vlon = nc.variables[lat_key], nc.variables[lon_key]
        lat = np.array(vlat[:], dtype=np.float64)
        lon = np.array(vlon[:], dtype=np.float64)
        rad_lat, rad_lon = _is_radian(vlat), _is_radian(vlon)
    if rad_lat != rad_lon:
        raise ValueError(
            f"{dataset}: '{lat_key}' and '{lon_key}' disagree on units "
            "(one radian, one degree)"
        )
    if layout is None:
        layout = (
            "points"
            if (lat.ndim > 1 or lon.ndim > 1 or len(lat) == len(lon))
            else "grid"
        )
    if layout == "grid":
        assert lat.ndim == 1 and lon.ndim == 1, "layout='grid' needs 1-D axes"
        lon, lat = np.meshgrid(lon, lat)
    elif layout != "points":
        raise ValueError(f"layout must be 'grid' or 'points', got '{layout}'")
    coords = np.stack([lat.ravel(), lon.ravel()], axis=-1)
    return coords if rad_lat else np.deg2rad(coords)


@node_builder_registry.register("AnemoiDatasetNodes")
def dataset_nodes(dataset: str) -> np.ndarray:
    """Nodes from an anemoi_tpu dataset directory (ref: from_file.py:26)."""
    from anemoi_tpu.data.dataset import open_dataset

    ds = open_dataset(dataset)
    return np.stack([ds.latitudes, ds.longitudes], axis=-1)


@node_builder_registry.register("ReducedGaussianGridNodes")
def reduced_gaussian_nodes(grid: str) -> np.ndarray:
    """Gaussian grids by name: 'o32'/'o96' (octahedral), 'n320' (reduced),
    'f64' (full). Ref: from_reduced_gaussian.py:22."""
    kind, n = grid[0].lower(), int(grid[1:])
    if kind == "o":
        return octahedral_gaussian_grid(n)
    if kind == "n":
        return reduced_gaussian_grid(n)
    if kind == "f":
        return full_gaussian_grid(n)
    raise ValueError(f"Unknown Gaussian grid spec '{grid}' (expected o/n/f + number)")


@node_builder_registry.register("RegularLatLonNodes")
def regular_nodes(resolution: float) -> np.ndarray:
    return regular_latlon_grid(resolution)


@node_builder_registry.register("TriNodes")
def tri_nodes(resolution: int) -> np.ndarray:
    """Triangular icosphere nodes (ref: from_refined_icosahedron.py:97)."""
    return create_tri_nodes(resolution)


@node_builder_registry.register("HEALPixNodes")
def healpix_nodes(resolution: int, scheme: str = "nested") -> np.ndarray:
    """HEALPix nodes; resolution is log2(nside) (ref: from_healpix.py:23).

    ``scheme='nested'`` (default) matches the indexing HEALPixMultiScaleEdges
    needs (coarse pixel c's first fine descendant is c*4^k); 'ring' keeps the
    analytic ring order."""
    if scheme == "nested":
        from anemoi_tpu.graphs.generate.healpix import healpix_grid_nested

        return healpix_grid_nested(2**resolution)
    assert scheme == "ring", f"unknown HEALPix scheme '{scheme}'"
    return healpix_grid(2**resolution)


@node_builder_registry.register("StretchedTriNodes")
def stretched_tri_nodes(
    global_resolution: int,
    lam_resolution: int,
    reference_node_name: Optional[str] = None,
    centre: Optional[list] = None,
    radius_deg: float = 10.0,
) -> np.ndarray:
    """Stretched mesh: fine icosphere inside an area of interest, coarse outside.

    Ref: from_refined_icosahedron.py:192 (LAM/stretched-grid support).  The area
    of interest is a spherical cap around ``centre`` (lat, lon degrees).
    """
    coarse = create_tri_nodes(global_resolution)
    fine = create_tri_nodes(lam_resolution)
    if centre is None:
        centre = [0.0, 0.0]
    c = np.deg2rad(np.asarray(centre, dtype=np.float64))
    cap_cos = np.cos(np.deg2rad(radius_deg))
    c_xyz = latlon_rad_to_xyz(c[None, :])[0]

    def in_cap(coords: np.ndarray) -> np.ndarray:
        return latlon_rad_to_xyz(coords) @ c_xyz > cap_cos

    keep_coarse = coarse[~in_cap(coarse)]
    keep_fine = fine[in_cap(fine)]
    return np.concatenate([keep_coarse, keep_fine], axis=0)


# ----------------------------------------------------------------------
# Node attributes
# ----------------------------------------------------------------------
@node_attribute_registry.register("UniformWeights")
def uniform_weights(graph: Graph, nodes_name: str, norm: Optional[str] = None) -> np.ndarray:
    n = graph[nodes_name].num_nodes
    return normalise(np.ones((n, 1), dtype=np.float32), norm)


@node_attribute_registry.register("SphericalAreaWeights")
def spherical_area_weights(
    graph: Graph,
    nodes_name: str,
    norm: Optional[str] = "unit-max",
    fill_value: float = 0.0,
) -> np.ndarray:
    """Voronoi cell area on the unit sphere per node (ref: area_weights.py:289)."""
    coords = graph[nodes_name].coords
    points = latlon_rad_to_xyz(coords)
    # SphericalVoronoi requires unique points
    sv = SphericalVoronoi(points, radius=1.0, center=np.zeros(3))
    mask = np.array([bool(r) for r in sv.regions])
    sv.regions = [r for r in sv.regions if r]
    areas = sv.calculate_areas()
    result = np.full(points.shape[0], fill_value, dtype=np.float64)
    result[mask] = areas
    return normalise(result.astype(np.float32)[:, None], norm)


@node_attribute_registry.register("CosineLatWeightedAttribute")
def cosine_lat_weights(
    graph: Graph,
    nodes_name: str,
    min_value: float = 1e-3,
    max_value: float = 1.0,
    norm: Optional[str] = None,
) -> np.ndarray:
    """(max-min) * cos(lat) + min (ref: area_weights.py:380)."""
    lat = graph[nodes_name].coords[:, 0]
    w = (max_value - min_value) * np.cos(lat) + min_value
    return normalise(w.astype(np.float32)[:, None], norm)


@node_attribute_registry.register("IsolatitudeAreaWeights")
def isolatitude_area_weights(
    graph: Graph, nodes_name: str, norm: Optional[str] = None
) -> np.ndarray:
    """Area of the latitude band divided by points in the band (ref: area_weights.py:413)."""
    lat = graph[nodes_name].coords[:, 0]
    unique_lats = np.sort(np.unique(lat))
    div = (unique_lats[1:] + unique_lats[:-1]) / 2
    div = np.concatenate([[-np.pi / 2], div, [np.pi / 2]])
    ring_area = 2 * np.pi * EARTH_RADIUS_KM * (np.sin(div[1:]) - np.sin(div[:-1]))
    ring_of = {l: i for i, l in enumerate(unique_lats)}
    rings = np.array([ring_of[l] for l in lat])
    counts = np.bincount(rings, minlength=len(unique_lats))
    w = (ring_area / counts)[rings]
    return normalise(w.astype(np.float32)[:, None], norm)


@node_attribute_registry.register("PlanarAreaWeights")
def planar_area_weights(graph: Graph, nodes_name: str, norm: Optional[str] = None) -> np.ndarray:
    """Planar Voronoi areas in (lat, lon) space, for limited-area grids
    (ref: area_weights.py:85).  Boundary cells are clipped to the convex hull."""
    from scipy.spatial import ConvexHull, Delaunay, Voronoi

    coords = graph[nodes_name].coords
    vor = Voronoi(coords[:, ::-1])  # (lon, lat) planar
    hull = ConvexHull(coords[:, ::-1])
    hull_tri = Delaunay(coords[:, ::-1][hull.vertices])
    areas = np.zeros(len(coords))
    for i, region_idx in enumerate(vor.point_region):
        region = vor.regions[region_idx]
        if -1 in region or len(region) == 0:
            areas[i] = 0.0
            continue
        poly = vor.vertices[region]
        # skip unbounded-ish cells whose vertices leave the hull
        if np.any(hull_tri.find_simplex(poly) < 0):
            areas[i] = 0.0
            continue
        x, y = poly[:, 0], poly[:, 1]
        areas[i] = 0.5 * abs(np.dot(x, np.roll(y, 1)) - np.dot(y, np.roll(x, 1)))
    fill = np.median(areas[areas > 0]) if np.any(areas > 0) else 1.0
    areas[areas == 0] = fill
    return normalise(areas.astype(np.float32)[:, None], norm)


@node_attribute_registry.register("CutOutMask")
def cutout_mask(
    graph: Graph,
    nodes_name: str,
    reference_node_name: str,
    min_distance_km: float = 0.0,
) -> np.ndarray:
    """Boolean mask: True where a node is NOT inside the footprint of the
    reference (limited-area) nodes (ref: masks.py:130)."""
    from sklearn.neighbors import BallTree

    coords = graph[nodes_name].coords
    ref = graph[reference_node_name].coords
    tree = BallTree(ref, metric="haversine")
    dist, _ = tree.query(coords, k=1)
    ref_tree = BallTree(ref, metric="haversine")
    d_ref, _ = ref_tree.query(ref, k=2)
    footprint = max(np.max(d_ref[:, 1]) * 1.5, min_distance_km / EARTH_RADIUS_KM)
    return (dist[:, 0] > footprint)[:, None]


@node_attribute_registry.register("AreaMask")
def area_mask(
    graph: Graph,
    nodes_name: str,
    lat_min: float = -90.0,
    lat_max: float = 90.0,
    lon_min: float = -180.0,
    lon_max: float = 180.0,
) -> np.ndarray:
    """Boolean mask of nodes inside a lat/lon box (degrees)."""
    coords = np.rad2deg(graph[nodes_name].coords)
    m = (
        (coords[:, 0] >= lat_min)
        & (coords[:, 0] <= lat_max)
        & (coords[:, 1] >= lon_min)
        & (coords[:, 1] <= lon_max)
    )
    return m[:, None]


@node_attribute_registry.register("BooleanOp")
def boolean_op_attribute(graph: Graph, nodes_name: str, op: str, attributes: list) -> np.ndarray:
    """Boolean combination of existing mask attributes (ref boolean_op.py)."""
    return apply_boolean_op(graph, nodes_name, op, attributes)


@node_builder_registry.register("LimitedAreaTriNodes")
def limited_area_tri_nodes(
    resolution: int,
    reference_node_name: str,
    margin_radius_km: float = 100.0,
    graph: Optional[Graph] = None,
) -> np.ndarray:
    """Tri icosphere clipped to the footprint of a reference (LAM) node set
    plus a margin (ref: from_refined_icosahedron.py:125 LimitedAreaTriNodes).

    The reference node set must be built EARLIER in the recipe; mesh nodes
    farther than ``margin_radius_km`` from every reference node are dropped."""
    from sklearn.neighbors import BallTree

    assert graph is not None and reference_node_name in graph.node_names(), (
        f"LimitedAreaTriNodes needs '{reference_node_name}' built earlier in the recipe"
    )
    mesh = create_tri_nodes(resolution)
    tree = BallTree(graph[reference_node_name].coords, metric="haversine")
    dist, _ = tree.query(mesh, k=1)
    keep = dist[:, 0] <= margin_radius_km / EARTH_RADIUS_KM
    assert keep.any(), "LimitedAreaTriNodes: no mesh nodes inside the area"
    return mesh[keep]


@node_builder_registry.register("HexNodes")
def hex_nodes(resolution: int) -> np.ndarray:
    """Hexagonal icosahedral nodes (ref from_refined_icosahedron.py:111).

    The reference builds these with the h3 library (not in this image); here
    the hex mesh is the dual (Goldberg) of the tri icosphere — see
    `graphs/generate/hexagons.py`.  Pair with ``MultiScaleEdges`` (hex
    adjacency is auto-detected from the 20*4^r node count)."""
    from anemoi_tpu.graphs.generate.hexagons import create_hex_nodes

    return create_hex_nodes(resolution)


@node_builder_registry.register("ICONMultiMeshNodes")
def icon_multimesh_nodes(grid_filename: str, max_level: Optional[int] = None) -> np.ndarray:
    """ICON multimesh (processor) nodes: grid-file vertices with refinement
    level <= max_level (ref from_icon.py:33 ICONMultiMeshNodes;
    icon_mesh.py:62-105).  Reads classic NetCDF-3 via scipy."""
    from anemoi_tpu.graphs.generate.icon import icon_multimesh

    return icon_multimesh(grid_filename, max_level).coords


@node_builder_registry.register("ICONCellGridNodes")
def icon_cell_grid_nodes(grid_filename: str, max_level: Optional[int] = None) -> np.ndarray:
    """ICON data (cell-circumcenter) nodes with cell refinement level <=
    max_level (ref from_icon.py:39 ICONCellGridNodes; icon_mesh.py:262-293)."""
    from anemoi_tpu.graphs.generate.icon import icon_cell_selection, load_icon_grid

    grid = load_icon_grid(grid_filename)
    sel = icon_cell_selection(grid, max_level)
    return np.stack([grid.clat[sel], grid.clon[sel]], axis=-1)


def apply_boolean_op(graph: Graph, nodes_name: str, op: str, attributes: list) -> np.ndarray:
    """Boolean combinations of existing masks (ref: boolean_op.py)."""
    masks = [graph[nodes_name].attributes[a].astype(bool) for a in attributes]
    if op == "and":
        out = np.logical_and.reduce(masks)
    elif op == "or":
        out = np.logical_or.reduce(masks)
    elif op == "not":
        (m,) = masks
        out = ~m
    else:
        raise ValueError(f"Unknown boolean op '{op}'")
    return out


def build_nodes(config: Dict, graph: Optional[Graph] = None) -> np.ndarray:
    import inspect

    cfg = dict(config)
    name = cfg.get("name") or cfg.get("_target_")
    factory = node_builder_registry.get(name)
    # builders that clip against earlier node sets (LimitedAreaTriNodes)
    # declare a ``graph`` parameter; others stay graph-free
    if graph is not None and "graph" in inspect.signature(factory).parameters:
        return node_builder_registry.build_from_config(cfg, graph=graph)
    return node_builder_registry.build_from_config(cfg)


def build_node_attribute(graph: Graph, nodes_name: str, config: Dict) -> np.ndarray:
    return node_attribute_registry.build_from_config(config, graph=graph, nodes_name=nodes_name)

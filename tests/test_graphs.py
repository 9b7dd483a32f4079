import numpy as np
import pytest

from anemoi_tpu.graphs import EdgeSet, Graph, NodeSet
from anemoi_tpu.graphs.generate.gaussian import (
    gaussian_latitudes,
    octahedral_gaussian_grid,
)
from anemoi_tpu.graphs.generate.healpix import healpix_grid
from anemoi_tpu.graphs.generate.icosahedron import (
    multi_scale_edge_index,
    num_tri_nodes,
    tri_icosphere,
)
from anemoi_tpu.graphs.transforms import (
    great_circle_distance,
    latlon_rad_to_xyz,
    xyz_to_latlon_rad,
)


def test_latlon_xyz_roundtrip(rng):
    coords = np.stack(
        [rng.uniform(-np.pi / 2, np.pi / 2, 100), rng.uniform(-np.pi, np.pi, 100)], axis=-1
    )
    back = xyz_to_latlon_rad(latlon_rad_to_xyz(coords))
    np.testing.assert_allclose(back, coords, atol=1e-10)


def test_great_circle():
    a = np.array([[0.0, 0.0]])
    b = np.array([[0.0, np.pi / 2]])
    np.testing.assert_allclose(great_circle_distance(a, b), [np.pi / 2], atol=1e-12)


def test_icosphere_counts():
    verts, faces_per_level, nverts = tri_icosphere(3)
    assert nverts == [12, 42, 162, 642]
    assert [num_tri_nodes(r) for r in range(4)] == nverts
    assert len(faces_per_level[-1]) == 20 * 4**3
    # all vertices on unit sphere
    np.testing.assert_allclose(np.linalg.norm(verts, axis=1), 1.0, atol=1e-12)


def test_multiscale_edges_symmetric():
    ei = multi_scale_edge_index(2)
    n = num_tri_nodes(2)
    assert ei.min() >= 0 and ei.max() < n
    pairs = set(map(tuple, ei.T.tolist()))
    assert all((d, s) in pairs for s, d in pairs), "multiscale edges must be symmetric"
    assert not any(s == d for s, d in pairs), "no self loops"
    # coarse-level edges span larger distances than finest-level-only edges
    fine_only = multi_scale_edge_index(2, scale_resolutions=[2])
    assert ei.shape[1] > fine_only.shape[1]


def test_gaussian_latitudes():
    lats = gaussian_latitudes(16)
    assert len(lats) == 32
    assert np.all(np.diff(lats) < 0)  # north to south
    np.testing.assert_allclose(lats, -lats[::-1], atol=1e-12)  # symmetric


def test_octahedral_grid():
    coords = octahedral_gaussian_grid(16)
    assert len(coords) == 4 * 16**2 + 36 * 16
    assert coords[:, 0].max() < np.pi / 2
    assert abs(coords[:, 1]).max() <= np.pi


@pytest.mark.parametrize(
    ("n", "official_total"),
    [(32, 6_114), (80, 35_718), (128, 88_838), (160, 138_346), (256, 348_528), (320, 542_080)],
)
def test_classic_reduced_gaussian_official_point_counts(n, official_total):
    """Classic N-grid point counts must match the official ECMWF values
    (e.g. ERA5 is N320 = 542,080 points, ERA-Interim N128 = 88,838), so real
    datasets on these grids fit `GaussianGridNodes("nXXX")` exactly.
    Reference: graphs/src/anemoi/graphs/nodes/builders/from_reduced_gaussian.py:22.
    """
    from anemoi_tpu.graphs.generate.gaussian import reduced_ring_lengths

    rings = reduced_ring_lengths(n)
    assert rings.size == 2 * n
    assert int(rings.sum()) == official_total
    # published classic grids are symmetric, monotone toward the equator,
    # FFT-friendly ({2,3,5}-smooth), and reach 4N at the equator
    np.testing.assert_array_equal(rings, rings[::-1])
    half = rings[:n]
    assert np.all(np.diff(half) >= 0)
    assert half[-1] == 4 * n
    for v in half.tolist():
        while v % 2 == 0:
            v //= 2
        while v % 3 == 0:
            v //= 3
        while v % 5 == 0:
            v //= 5
        assert v == 1


def test_reduced_gaussian_pl_override(tmp_path, monkeypatch):
    """ANEMOI_TPU_PL_TABLES npz takes precedence over vendored tables."""
    from anemoi_tpu.graphs.generate.gaussian import reduced_ring_lengths

    half = np.full(32, 64, dtype=np.int64)
    np.savez(tmp_path / "pl.npz", n32=half)
    monkeypatch.setenv("ANEMOI_TPU_PL_TABLES", str(tmp_path / "pl.npz"))
    rings = reduced_ring_lengths(32)
    assert rings.size == 64 and int(rings.sum()) == 64 * 64


def test_healpix_grid():
    coords = healpix_grid(4)
    assert len(coords) == 12 * 16
    # rings symmetric about equator
    np.testing.assert_allclose(np.sort(coords[:, 0]), -np.sort(coords[:, 0])[::-1], atol=1e-12)


def test_edgeset_dst_sort():
    ei = np.array([[0, 1, 2, 0], [2, 0, 1, 1]])
    es = EdgeSet(edge_index=ei, attributes={"w": np.array([1.0, 2.0, 3.0, 4.0])})
    sorted_es = es.sort_by_dst(num_dst=3)
    assert np.all(np.diff(sorted_es.edge_index[1]) >= 0)
    np.testing.assert_array_equal(sorted_es.dst_ptr, [0, 1, 3, 4])
    # attribute permuted consistently: edge (0->1) had weight 4
    i = np.where(
        (sorted_es.edge_index[0] == 0) & (sorted_es.edge_index[1] == 1)
    )[0][0]
    assert sorted_es.attributes["w"][i] == 4.0


def test_tiny_graph_structure(tiny_graph):
    g = tiny_graph
    assert set(g.node_names()) == {"data", "hidden"}
    assert set(g.edge_keys()) == {("data", "hidden"), ("hidden", "hidden"), ("hidden", "data")}
    for key in g.edge_keys():
        es = g[key]
        assert es.is_dst_sorted
        assert np.all(np.diff(es.edge_index[1]) >= 0)
        assert es.dst_ptr[-1] == es.num_edges
        # every dst node of a knn/cutoff edge set gets >= 1 edge
    # decoder: every data node has exactly 3 incoming edges (knn k=3)
    dec = g[("hidden", "data")]
    np.testing.assert_array_equal(np.diff(dec.dst_ptr), 3)
    # area weights positive, max normalised
    w = g["data"].attributes["area_weight"]
    assert w.max() == pytest.approx(1.0)
    assert w.min() > 0


def test_graph_save_load(tiny_graph, tmp_path):
    path = str(tmp_path / "graph.npz")
    tiny_graph.save(path)
    g2 = Graph.load(path)
    assert set(g2.node_names()) == set(tiny_graph.node_names())
    for key in tiny_graph.edge_keys():
        np.testing.assert_array_equal(g2[key].edge_index, tiny_graph[key].edge_index)
        np.testing.assert_array_equal(g2[key].dst_ptr, tiny_graph[key].dst_ptr)
        for a in tiny_graph[key].attributes:
            np.testing.assert_array_equal(g2[key].attributes[a], tiny_graph[key].attributes[a])


def test_edge_attribute_shapes(tiny_graph):
    enc = tiny_graph[("data", "hidden")]
    assert enc.attributes["edge_length"].shape == (enc.num_edges, 1)
    assert enc.attributes["edge_dirs"].shape == (enc.num_edges, 2)
    assert enc.attribute_matrix(["edge_dirs", "edge_length"]).shape == (enc.num_edges, 3)


def test_limited_area_tri_nodes():
    """LimitedAreaTriNodes (ref from_refined_icosahedron.py:125): icosphere
    clipped to the footprint of an earlier-built LAM node set + margin."""
    from anemoi_tpu.graphs.create import GraphCreator
    from anemoi_tpu.graphs.generate.icosahedron import create_tri_nodes

    lat = np.linspace(40.0, 55.0, 8)
    lon = np.linspace(0.0, 20.0, 8)
    glat, glon = np.meshgrid(lat, lon, indexing="ij")
    recipe = {
        "nodes": {
            "data": {
                "node_builder": {
                    "name": "LatLonNodes",
                    "latitudes": glat.ravel().tolist(),
                    "longitudes": glon.ravel().tolist(),
                }
            },
            "hidden": {
                "node_builder": {
                    "name": "LimitedAreaTriNodes",
                    "resolution": 4,
                    "reference_node_name": "data",
                    "margin_radius_km": 300.0,
                }
            },
        },
        "edges": [],
    }
    graph = GraphCreator(recipe).create()
    mesh = graph["hidden"].coords
    full = create_tri_nodes(4)
    assert 0 < mesh.shape[0] < full.shape[0] // 4, mesh.shape
    # every kept node is within the margin of some data node
    from sklearn.neighbors import BallTree

    tree = BallTree(graph["data"].coords, metric="haversine")
    dist, _ = tree.query(mesh, k=1)
    assert (dist[:, 0] * 6371.0 <= 300.0 + 1e-6).all()


def test_healpix_nested_neighbours():
    """Nested centres match the ring set; vertex-sharing adjacency has the
    HEALPix structure (degree 8 everywhere except the 24 gore-corner pixels)."""
    from anemoi_tpu.graphs.generate.healpix import (
        healpix_grid, healpix_grid_nested, healpix_neighbours,
    )

    ring = set(map(tuple, np.round(healpix_grid(4), 10)))
    nest = set(map(tuple, np.round(healpix_grid_nested(4), 10)))
    assert ring == nest
    nbr = healpix_neighbours(2)
    deg = (nbr >= 0).sum(1)
    counts = dict(zip(*np.unique(deg, return_counts=True)))
    assert counts == {7: 24, 8: 168}
    for i in range(nbr.shape[0]):  # symmetry
        for j in nbr[i][nbr[i] >= 0]:
            assert i in nbr[j]


def test_healpix_multiscale_edges_builder():
    from anemoi_tpu.graphs.create import GraphCreator

    recipe = {
        "nodes": {"hidden": {"node_builder": {"name": "HEALPixNodes", "resolution": 3}}},
        "edges": [
            {"source_name": "hidden", "target_name": "hidden",
             "edge_builder": {"name": "HEALPixMultiScaleEdges",
                              "scale_resolutions": [1, 2, 3]}},
        ],
    }
    g = GraphCreator(recipe).create()
    es = g.edges[("hidden", "hidden")]
    assert g["hidden"].num_nodes == 12 * 64
    assert es.edge_index.max() < 12 * 64
    # the finest level alone gives ~npix*8 directed edges; multiscale adds more
    assert es.edge_index.shape[1] > 12 * 64 * 7
    # coarse edges land on first-descendant pixels (multiples of 4)
    src, dst = es.edge_index
    fine_only = GraphCreator({
        "nodes": recipe["nodes"],
        "edges": [{"source_name": "hidden", "target_name": "hidden",
                   "edge_builder": {"name": "HEALPixMultiScaleEdges",
                                    "scale_resolutions": [3]}}],
    }).create().edges[("hidden", "hidden")]
    extra = es.edge_index.shape[1] - fine_only.edge_index.shape[1]
    assert extra > 0


def test_projection_builders():
    from anemoi_tpu.graphs.builders import (
        build_node_to_node_projection_subgraph,
        build_smoother_subgraph,
        build_truncation_subgraph,
        uses_fused_dataset_graph,
    )
    from anemoi_tpu.graphs.create import GraphCreator

    g = GraphCreator({
        "nodes": {"data": {"node_builder": {"name": "ReducedGaussianGridNodes",
                                            "grid": "o8"}}},
        "edges": [],
    }).create()

    # truncation: data <-> coarse grid, both directions, gaussian weights
    sub = build_truncation_subgraph(g, "data", {"grid": "o4",
                                                "num_nearest_neighbours": 3,
                                                "sigma": 0.2})
    assert ("data", "truncation") in sub.edges and ("truncation", "data") in sub.edges
    w = sub[("data", "truncation")].attributes["gauss_weight"]
    assert w.shape[1] == 1 and (w >= 0).all()
    # l1 norm: weights sum to ~1 per target
    dst = sub[("data", "truncation")].edge_index[1]
    sums = np.zeros(sub["truncation"].num_nodes)
    np.add.at(sums, dst, w[:, 0])
    np.testing.assert_allclose(sums, 1.0, atol=1e-5)

    # projection to a NEW grid
    sub2 = build_node_to_node_projection_subgraph(
        g, "data", "coarse", {"grid": "o4", "num_nearest_neighbours": 2, "sigma": 0.3})
    assert ("data", "coarse") in sub2.edges
    # smoother: self loops
    sub3 = build_smoother_subgraph(g, "data", {"num_nearest_neighbours": 4, "sigma": 0.1})
    assert ("data", "data") in sub3.edges

    assert not uses_fused_dataset_graph(g, ["data"])
    assert uses_fused_dataset_graph(
        {"nodes": {"era5": {}, "obs": {}}}, ["era5", "obs"])


def test_text_nodes(tmp_path):
    """TextNodes: whitespace file, rows = coordinate components (ref
    from_file.py:66)."""
    from anemoi_tpu.graphs.create import GraphCreator

    lons = np.array([0.0, 90.0, 180.0, -90.0])
    lats = np.array([10.0, 20.0, -10.0, -20.0])
    path = tmp_path / "coords.txt"
    np.savetxt(path, np.stack([lons, lats]))
    g = GraphCreator({
        "nodes": {"data": {"node_builder": {
            "name": "TextNodes", "dataset": str(path), "idx_lon": 0, "idx_lat": 1,
        }}},
        "edges": [],
    }).create()
    got = np.rad2deg(g["data"].coords)
    np.testing.assert_allclose(got[:, 0], lats, atol=1e-6)
    # longitudes normalise to their canonical range
    np.testing.assert_allclose(np.cos(np.deg2rad(got[:, 1])),
                               np.cos(np.deg2rad(lons)), atol=1e-6)


def test_plotting_and_cli_plot(tmp_path):
    """The matplotlib plotting suite + `anemoi-tpu-graphs plot` write figures
    for every node/edge set (ref graphs/plotting/)."""
    from anemoi_tpu.graphs import plotting
    from anemoi_tpu.graphs.cli import main as graphs_main
    from anemoi_tpu.graphs.create import GraphCreator

    g = GraphCreator({
        "nodes": {
            "data": {"node_builder": {"name": "ReducedGaussianGridNodes", "grid": "o8"},
                     "attributes": {"area_weight": {"name": "SphericalAreaWeights"}}},
            "hidden": {"node_builder": {"name": "TriNodes", "resolution": 1}},
        },
        "edges": [
            {"source_name": "data", "target_name": "hidden",
             "edge_builder": {"name": "KNNEdges", "num_nearest_neighbours": 3},
             "attributes": {"edge_length": {"name": "EdgeLength"}}},
        ],
    }).create(str(tmp_path / "g.npz"))

    plotting.plot_nodes(g, "data", attribute="area_weight",
                        out_file=str(tmp_path / "n.png"))
    plotting.plot_subgraph(g, ("data", "hidden"), out_file=str(tmp_path / "e.png"))
    assert (tmp_path / "n.png").stat().st_size > 1000

    out = tmp_path / "plots"
    assert graphs_main(["plot", str(tmp_path / "g.npz"), str(out)]) == 0
    names = {p.name for p in out.iterdir()}
    assert {"nodes_data.png", "nodes_hidden.png", "edges_data_to_hidden.png",
            "isolated_nodes.png", "node_attributes.png",
            "edge_attributes.png"} <= names


def test_inspect_tools_statistics_and_export(tmp_path):
    """edge_statistics + export_to_sparse round-trip (weak spot: untested
    utilities)."""
    import scipy.sparse as sp

    from anemoi_tpu.graphs.create import GraphCreator
    from anemoi_tpu.graphs.inspect_tools import edge_statistics, export_to_sparse

    g = GraphCreator({
        "nodes": {
            "data": {"node_builder": {"name": "ReducedGaussianGridNodes", "grid": "o4"}},
            "hidden": {"node_builder": {"name": "TriNodes", "resolution": 0}},
        },
        "edges": [
            {"source_name": "data", "target_name": "hidden",
             "edge_builder": {"name": "KNNEdges", "num_nearest_neighbours": 2},
             "attributes": {"edge_length": {"name": "EdgeLength"}}},
        ],
    }).create()
    stats = edge_statistics(g)
    key = next(iter(stats))
    assert stats[key]["num_edges"] == g[("data", "hidden")].num_edges
    assert stats[key]["in_degree"]["mean"] > 0
    assert stats[key]["length_rad"]["max"] > 0

    written = export_to_sparse(g, str(tmp_path / "sparse"))
    mat = sp.load_npz(next(iter(written.values())))
    assert mat.shape == (g["hidden"].num_nodes, g["data"].num_nodes) or mat.shape == (
        g["data"].num_nodes, g["hidden"].num_nodes)
    assert mat.nnz == g[("data", "hidden")].num_edges


# ----------------------------------------------------------------------
# Hexagonal (dual icosphere) meshes — HexNodes + MultiScaleEdges
# ----------------------------------------------------------------------
def test_hex_nodes_and_adjacency():
    from anemoi_tpu.graphs.generate.hexagons import (
        create_hex_nodes,
        face_adjacency_edges,
        num_hex_nodes,
    )

    coords = create_hex_nodes(2)
    assert coords.shape == (num_hex_nodes(2), 2) == (320, 2)
    assert np.abs(coords[:, 0]).max() <= np.pi / 2 + 1e-12

    _, faces_per_level, _ = tri_icosphere(2)
    adj = face_adjacency_edges(faces_per_level[-1])
    # closed manifold: every face has exactly 3 face-neighbours
    deg = np.bincount(adj.ravel(), minlength=320)
    assert (deg == 3).all()


def test_hex_multiscale_edges():
    from anemoi_tpu.graphs.generate.hexagons import (
        hex_multi_scale_edge_index,
        num_hex_nodes,
    )

    n = num_hex_nodes(2)
    ei = hex_multi_scale_edge_index(2)
    assert ei.min() >= 0 and ei.max() < n
    pairs = set(map(tuple, ei.T.tolist()))
    assert all((d, s) in pairs for s, d in pairs), "hex multiscale edges must be symmetric"
    assert not any(s == d for s, d in pairs)
    # multi-scale adds coarse edges beyond the finest level's 3-regular graph
    fine_only = hex_multi_scale_edge_index(2, scale_resolutions=[2])
    assert fine_only.shape[1] == 3 * n  # 3-regular, both directions
    assert ei.shape[1] > fine_only.shape[1]
    # x_hops widens neighbourhoods; depth_children adds cross-level edges.
    # depth 1 coincides with the finer level's adjacency (the centre child is
    # face-adjacent to its 3 siblings) so only depth >= 2 adds edges.
    assert hex_multi_scale_edge_index(2, scale_resolutions=[2], x_hops=2).shape[1] > 3 * n
    with_children = hex_multi_scale_edge_index(2, depth_children=2)
    assert with_children.shape[1] > ei.shape[1]


def test_hex_nodes_via_recipe():
    from anemoi_tpu.graphs.create import GraphCreator

    g = GraphCreator(
        {
            "nodes": {"hidden": {"node_builder": {"name": "HexNodes", "resolution": 1}}},
            "edges": [
                {
                    "source_name": "hidden",
                    "target_name": "hidden",
                    "edge_builder": {"name": "MultiScaleEdges"},  # hex inferred from 80 nodes
                    "attributes": {"edge_length": {"name": "EdgeLength"}},
                }
            ],
        }
    ).create()
    es = g[("hidden", "hidden")]
    assert g["hidden"].num_nodes == 80
    assert es.is_dst_sorted and es.num_edges > 0
    assert es.attributes["edge_length"].shape == (es.num_edges, 1)


# ----------------------------------------------------------------------
# ICON grids (scipy NetCDF-3) — nodes, multimesh hierarchy, topological edges
# ----------------------------------------------------------------------
@pytest.fixture(scope="module")
def icon_grid_file(tmp_path_factory):
    from anemoi_tpu.graphs.generate.icon import write_synthetic_icon_grid

    path = str(tmp_path_factory.mktemp("icon") / "icon_grid.nc")
    write_synthetic_icon_grid(path, resolution=3)
    return path


def test_icon_multimesh_hierarchy(icon_grid_file):
    from anemoi_tpu.graphs.generate.icon import icon_multimesh, load_icon_grid

    grid = load_icon_grid(icon_grid_file)
    assert grid.num_vertices == 642 and grid.max_refinement_level == 3

    # full-depth multimesh: finest level edge set = icosphere adjacency
    mesh = icon_multimesh(icon_grid_file, None)
    assert mesh.num_nodes == 642
    assert len(mesh.edge_levels) == 4
    # contraction must recover each level's icosphere adjacency exactly
    _, faces_per_level, nverts = tri_icosphere(3)
    for level in range(4):
        expect = np.unique(
            np.sort(
                np.concatenate(
                    [
                        faces_per_level[level][:, [0, 1]],
                        faces_per_level[level][:, [1, 2]],
                        faces_per_level[level][:, [2, 0]],
                    ]
                ),
                axis=1,
            ),
            axis=0,
        )
        got = np.unique(np.sort(mesh.edge_levels[level], axis=1), axis=0)
        np.testing.assert_array_equal(got, expect)
        assert mesh.edge_levels[level].max() < nverts[level]

    # restricted multimesh: vertices are the level-1 prefix, cells contract
    # to their level-1 ancestor triangles
    mesh1 = icon_multimesh(icon_grid_file, 1)
    assert mesh1.num_nodes == 42 and len(mesh1.edge_levels) == 2
    assert mesh1.cell_vertices.shape == (20 * 4**3, 3)
    assert mesh1.cell_vertices.max() < 42
    # each level-1 triangle has 4^2 descendant cells -> every ancestor
    # triple appears exactly 16 times
    _, counts = np.unique(np.sort(mesh1.cell_vertices, axis=1), axis=0, return_counts=True)
    assert (counts == 16).all() and len(counts) == 20 * 4


def test_icon_builders_via_recipe(icon_grid_file):
    from anemoi_tpu.graphs.create import GraphCreator

    g = GraphCreator(
        {
            "nodes": {
                "data": {
                    "node_builder": {
                        "name": "ICONCellGridNodes",
                        "grid_filename": icon_grid_file,
                    }
                },
                "hidden": {
                    "node_builder": {
                        "name": "ICONMultiMeshNodes",
                        "grid_filename": icon_grid_file,
                        "max_level": 2,
                    }
                },
            },
            "edges": [
                {
                    "source_name": "data",
                    "target_name": "hidden",
                    "edge_builder": {
                        "name": "ICONTopologicalEncoderEdges",
                        "grid_filename": icon_grid_file,
                        "max_level": 2,
                    },
                },
                {
                    "source_name": "hidden",
                    "target_name": "hidden",
                    "edge_builder": {
                        "name": "ICONTopologicalProcessorEdges",
                        "grid_filename": icon_grid_file,
                        "max_level": 2,
                    },
                },
                {
                    "source_name": "hidden",
                    "target_name": "data",
                    "edge_builder": {
                        "name": "ICONTopologicalDecoderEdges",
                        "grid_filename": icon_grid_file,
                        "max_level": 2,
                    },
                },
            ],
        }
    ).create()

    num_cells, num_mesh = 20 * 4**3, 162
    assert g["data"].num_nodes == num_cells
    assert g["hidden"].num_nodes == num_mesh

    enc = g[("data", "hidden")]
    assert enc.is_dst_sorted and enc.num_edges == 3 * num_cells
    # every cell connects to exactly 3 distinct mesh vertices
    assert (np.bincount(enc.edge_index[0], minlength=num_cells) == 3).all()

    dec = g[("hidden", "data")]
    assert dec.num_edges == 3 * num_cells
    assert (np.bincount(dec.edge_index[1], minlength=num_cells) == 3).all()
    # decoder is the encoder reversed
    assert set(map(tuple, dec.edge_index.T.tolist())) == set(
        map(tuple, enc.edge_index[::-1].T.tolist())
    )

    proc = g[("hidden", "hidden")]
    pairs = set(map(tuple, proc.edge_index.T.tolist()))
    assert all((d, s) in pairs for s, d in pairs), "processor edges bidirectional"
    assert proc.edge_index.max() < num_mesh


def test_xarray_nodes(tmp_path):
    from scipy.io import netcdf_file

    from anemoi_tpu.graphs.nodes import build_nodes

    path = str(tmp_path / "coords.nc")
    with netcdf_file(path, "w") as nc:
        nc.createDimension("lat", 3)
        nc.createDimension("lon", 4)
        v = nc.createVariable("lat", "d", ("lat",))
        v[:] = [60.0, 0.0, -60.0]
        v = nc.createVariable("lon", "d", ("lon",))
        v[:] = [0.0, 90.0, 180.0, 270.0]
    # reference-default keys 'lat'/'lon' (from_file.py XArrayNodes)
    coords = build_nodes({"name": "XArrayNodes", "dataset": path})
    assert coords.shape == (12, 2)
    np.testing.assert_allclose(coords[0], np.deg2rad([60.0, 0.0]))
    np.testing.assert_allclose(coords[-1], np.deg2rad([-60.0, 270.0]))


def test_xarray_nodes_layouts_and_units(tmp_path):
    from scipy.io import netcdf_file

    from anemoi_tpu.graphs.nodes import build_nodes

    # equal-length 1-D vectors default to paired points; layout="grid"
    # forces a meshgrid; custom keys + radian units respected
    path = str(tmp_path / "pts.nc")
    with netcdf_file(path, "w") as nc:
        nc.createDimension("n", 3)
        v = nc.createVariable("latitude", "d", ("n",))
        v[:] = [0.5, 0.0, -0.5]
        v.units = "radian"
        v = nc.createVariable("longitude", "d", ("n",))
        v[:] = [0.0, 1.0, 2.0]
        v.units = "radian"
    kw = {"name": "XArrayNodes", "dataset": path,
          "lat_key": "latitude", "lon_key": "longitude"}
    pts = build_nodes(dict(kw))
    assert pts.shape == (3, 2)
    np.testing.assert_allclose(pts[0], [0.5, 0.0])
    grid = build_nodes(dict(kw, layout="grid"))
    assert grid.shape == (9, 2)
    with pytest.raises(KeyError, match="lat_key"):
        build_nodes({"name": "XArrayNodes", "dataset": path})


def test_multiscale_edges_rejects_wrong_node_count():
    from anemoi_tpu.graphs import Graph, NodeSet
    from anemoi_tpu.graphs.edges import multi_scale_edges

    g = Graph()
    g["m"] = NodeSet(coords=np.zeros((100, 2)))  # not 10*4^r+2
    with pytest.raises(AssertionError, match="MultiScaleEdges"):
        multi_scale_edges(g, "m", "m", mesh_type="tri")


def test_icon_contract_cells_nested_fallback():
    """LAM/nested ICON grids: cells without a complete ancestor triangle are
    marked [-1,-1,-1] and skipped by grid2mesh edges (the reference's csum==3
    selection with -1 substitution, icon_mesh.py:213-240) instead of failing
    the global-grid assertion."""
    from anemoi_tpu.graphs.generate.icon import _contract_cells

    # vertices 0..2 coarse (map to themselves); vertex 3 a midpoint of (0,1);
    # vertex 4 an UNMAPPED nest-boundary midpoint (identity map)
    parents = np.array([[0, 0], [1, 1], [2, 2], [0, 1], [4, 4]], dtype=np.int64)
    reflvl = np.array([0, 0, 0, 1, 1], dtype=np.int64)  # 3, 4 are midpoints
    cells = np.array(
        [
            [0, 3, 2],  # contracts to {0,1,2}: valid parent triangle
            [0, 4, 2],  # midpoint 4 unmapped -> no coarse parent triangle
            [-1, -1, -1],  # already-invalid rows propagate
        ],
        dtype=np.int64,
    )
    out = _contract_cells(cells, parents, reflvl, level=1)
    np.testing.assert_array_equal(out[0], [0, 1, 2])
    np.testing.assert_array_equal(out[1], [-1, -1, -1])
    np.testing.assert_array_equal(out[2], [-1, -1, -1])


def test_icon_cache_keyed_by_mtime(tmp_path):
    """Regenerating a grid file at the same path must invalidate the cache;
    cached arrays are read-only."""
    import os

    from anemoi_tpu.graphs.generate.icon import (
        load_icon_grid,
        write_synthetic_icon_grid,
    )

    path = str(tmp_path / "icon.nc")
    write_synthetic_icon_grid(path, resolution=2)
    g1 = load_icon_grid(path)
    assert not g1.vlon.flags.writeable
    with pytest.raises(ValueError):
        g1.vlon[0] = 99.0
    n1 = g1.num_vertices

    write_synthetic_icon_grid(path, resolution=3)
    os.utime(path, (os.path.getmtime(path) + 2, os.path.getmtime(path) + 2))
    g2 = load_icon_grid(path)
    assert g2.num_vertices > n1

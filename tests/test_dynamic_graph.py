"""Runtime (in-jit) graph providers: dynamic kNN and sparse projection.

Mirrors the reference's graph-provider surface
(/root/reference/models/src/anemoi/models/layers/graph_provider.py:341 Dynamic,
:464 Projection); the dynamic provider here actually implements the runtime
construction the reference leaves as a future hook."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from anemoi_tpu.graphs.edges import edge_direction, edge_length, knn_edges
from anemoi_tpu.graphs.graph import EdgeSet, Graph, NodeSet
from anemoi_tpu.models.layers.embed import sincos_coordinates
from anemoi_tpu.ops.dynamic import (
    check_out_degree,
    runtime_edge_attributes,
    runtime_knn_tables,
)
from anemoi_tpu.ops.padded import PaddedCSR, PaddedTables, padded_gt_attention_flat
from anemoi_tpu.ops.sparse_projector import SparseProjector


def _random_graph(rng, ns=40, nd=90):
    lat_s = np.arcsin(rng.uniform(-1, 1, ns))
    lon_s = rng.uniform(-np.pi, np.pi, ns)
    lat_d = np.arcsin(rng.uniform(-1, 1, nd))
    lon_d = rng.uniform(-np.pi, np.pi, nd)
    g = Graph()
    g["src"] = NodeSet(coords=np.stack([lat_s, lon_s], axis=-1))
    g["dst"] = NodeSet(coords=np.stack([lat_d, lon_d], axis=-1))
    return g


@pytest.fixture
def graph(rng):
    return _random_graph(rng)


def _host_tables(g, k):
    ei = knn_edges(g, "src", "dst", num_nearest_neighbours=k)
    order = np.argsort(ei[1], kind="stable")
    ei = ei[:, order]
    nd = g["dst"].num_nodes
    dst_ptr = np.searchsorted(ei[1], np.arange(nd + 1))
    csr = PaddedCSR.from_edge_index(ei, dst_ptr, num_src=g["src"].num_nodes)
    return ei, PaddedTables.from_csr(csr)


def test_runtime_knn_matches_host_builder(graph, rng):
    """Runtime kNN attention (tables + attrs built inside jit) == the same
    computation on the host-built KNNEdges graph."""
    k = 3
    src_feat = jnp.asarray(sincos_coordinates(graph["src"].coords))
    dst_feat = jnp.asarray(sincos_coordinates(graph["dst"].coords))

    ei_host, tables_host = _host_tables(graph, k)
    dirs = edge_direction(graph, "src", "dst", ei_host)
    length = edge_length(graph, "src", "dst", ei_host)
    attr_host = np.concatenate([dirs, length], axis=-1)

    h, d = 2, 64
    hd = h * d
    q = jnp.asarray(rng.normal(size=(graph["dst"].num_nodes, hd)), jnp.float32)
    kv = jnp.asarray(rng.normal(size=(graph["src"].num_nodes, hd)), jnp.float32)
    w_e = jnp.asarray(rng.normal(size=(3, hd)) * 0.1, jnp.float32)

    def runtime_out(q, kv, src_feat, dst_feat):
        tbl = runtime_knn_tables(src_feat, dst_feat, k=k, k_out=16)
        attr = runtime_edge_attributes(src_feat, dst_feat, tbl)
        e = jnp.dot(attr, w_e)
        return padded_gt_attention_flat(q, kv, kv, e, h, tbl)

    out_rt = jax.jit(runtime_out)(q, kv, src_feat, dst_feat)
    e_host = jnp.dot(jnp.asarray(attr_host), w_e)
    out_host = padded_gt_attention_flat(q, kv, kv, e_host, h, tables_host)
    np.testing.assert_allclose(
        np.asarray(out_rt), np.asarray(out_host), rtol=2e-4, atol=2e-5
    )


def test_runtime_knn_gradients(graph, rng):
    """Gradients flow through the runtime tables (scatter-free backward) and
    match the host-table path."""
    k = 3
    src_feat = jnp.asarray(sincos_coordinates(graph["src"].coords))
    dst_feat = jnp.asarray(sincos_coordinates(graph["dst"].coords))
    _, tables_host = _host_tables(graph, k)

    h, d = 2, 64
    hd = h * d
    q = jnp.asarray(rng.normal(size=(graph["dst"].num_nodes, hd)), jnp.float32)
    kv = jnp.asarray(rng.normal(size=(graph["src"].num_nodes, hd)), jnp.float32)

    def loss_rt(q, kv):
        tbl = runtime_knn_tables(src_feat, dst_feat, k=k, k_out=16)
        return jnp.sum(padded_gt_attention_flat(q, kv, kv, None, h, tbl) ** 2)

    def loss_host(q, kv):
        return jnp.sum(
            padded_gt_attention_flat(q, kv, kv, None, h, tables_host) ** 2
        )

    g_rt = jax.jit(jax.grad(loss_rt, argnums=(0, 1)))(q, kv)
    g_host = jax.grad(loss_host, argnums=(0, 1))(q, kv)
    for a, b in zip(g_rt, g_host):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


def test_runtime_knn_out_degree_check(graph):
    src_feat = jnp.asarray(sincos_coordinates(graph["src"].coords))
    dst_feat = jnp.asarray(sincos_coordinates(graph["dst"].coords))
    tbl = runtime_knn_tables(src_feat, dst_feat, k=3, k_out=64)
    max_deg = int(check_out_degree(tbl, 64))
    assert 0 < max_deg <= 64


def test_dynamic_knn_encoder_end_to_end(rng):
    """EncProcDec with a DynamicKNN encoder provider: forward+grad runs, and
    matches a model built on the equivalent static KNN graph."""
    from tests.test_models import make_indices, make_statistics
    from anemoi_tpu.graphs.create import GraphCreator
    from anemoi_tpu.models.interface import AnemoiModelInterface

    recipe = {
        "nodes": {
            "data": {"node_builder": {"name": "RegularLatLonNodes", "resolution": 16}},
            "hidden": {"node_builder": {"name": "TriNodes", "resolution": 0}},
        },
        "edges": [
            {
                "source_name": "data", "target_name": "hidden",
                "edge_builder": {"name": "KNNEdges", "num_nearest_neighbours": 3},
                "attributes": {"edge_dirs": {"name": "EdgeDirection"},
                               "edge_length": {"name": "EdgeLength"}},
            },
            {
                "source_name": "hidden", "target_name": "hidden",
                "edge_builder": {"name": "MultiScaleEdges", "x_hops": 1},
                "attributes": {"edge_dirs": {"name": "EdgeDirection"},
                               "edge_length": {"name": "EdgeLength"}},
            },
            {
                "source_name": "hidden", "target_name": "data",
                "edge_builder": {"name": "KNNEdges", "num_nearest_neighbours": 3},
                "attributes": {"edge_dirs": {"name": "EdgeDirection"},
                               "edge_length": {"name": "EdgeLength"}},
            },
        ],
    }
    graph = GraphCreator(recipe).create()

    def build(dynamic):
        gt = {"num_heads": 4, "mlp_hidden_ratio": 2.0,
              "sub_graph_edge_attributes": ["edge_dirs", "edge_length"]}
        enc = {"name": "GraphTransformerForwardMapper", **gt}
        if dynamic:
            enc["edge_provider"] = {
                "name": "DynamicKNN", "num_nearest_neighbours": 3,
                "max_out_degree": 64,
            }
        cfg = {
            "model": {
                "name": "AnemoiModelEncProcDec",
                "num_channels": 16,
                "n_step_input": 2,
                "n_step_output": 1,
                "encoder": enc,
                "processor": {"name": "GraphTransformerProcessor",
                              "num_layers": 1, "gradient_checkpointing": False,
                              **gt},
                "decoder": {"name": "GraphTransformerBackwardMapper", **gt},
            },
            "data": {"processors": []},
        }
        return AnemoiModelInterface(
            config=cfg, graph=graph,
            data_indices={"data": make_indices()},
            statistics={"data": make_statistics()},
        )

    iface_s = build(dynamic=False)
    iface_d = build(dynamic=True)
    params = iface_s.init_params(jax.random.PRNGKey(0))
    n_grid = graph["data"].num_nodes
    x = {"data": jnp.asarray(rng.normal(size=(1, 2, 1, n_grid, 5)), jnp.float32)}
    out_s = iface_s.apply(params, x)
    out_d = iface_d.apply(params, x)
    # same edge set (kNN of the same coords) + same attribute formulas =>
    # numerically equal encoder; tolerance covers fp reorderings and the
    # in-jit vs host attribute normalisation
    np.testing.assert_allclose(
        np.asarray(out_d["data"]), np.asarray(out_s["data"]), rtol=1e-3, atol=1e-4
    )


def test_projection_provider_from_graph_and_file(tmp_path, rng):
    g = _random_graph(rng, ns=30, nd=12)
    ei = knn_edges(g, "src", "dst", num_nearest_neighbours=2)
    order = np.argsort(ei[1], kind="stable")
    ei = ei[:, order]
    w = rng.uniform(0.5, 2.0, ei.shape[1]).astype(np.float32)
    g[("src", "dst")] = EdgeSet(edge_index=ei, attributes={"w": w[:, None]})

    proj = SparseProjector.from_graph(
        g, ("src", "to", "dst"), edge_weight_attribute="w", row_normalize=True
    )
    x = jnp.asarray(rng.normal(size=(30, 4)), jnp.float32)
    got = np.asarray(proj(x))
    dense = proj.as_dense()
    np.testing.assert_allclose(got, dense @ np.asarray(x), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(dense.sum(axis=1), 1.0, rtol=1e-5)

    # node-weight flavour
    g["src"].attributes["nw"] = rng.uniform(0.1, 1.0, 30).astype(np.float32)
    proj_nw = SparseProjector.from_graph(
        g, ("src", "to", "dst"), src_node_weight_attribute="nw", row_normalize=True
    )
    assert np.asarray(proj_nw(x)).shape == (12, 4)

    # file round-trip (COO and CSR forms)
    f1 = tmp_path / "proj_coo.npz"
    np.savez(f1, src=ei[0], dst=ei[1], weights=w, num_dst=12)
    p1 = SparseProjector.from_file(f1, row_normalize=True)
    np.testing.assert_allclose(np.asarray(p1(x)), got, rtol=1e-5, atol=1e-6)

    # CSR (scipy-layout) form
    num_dst = 12
    counts = np.bincount(ei[1], minlength=num_dst)
    indptr = np.zeros(num_dst + 1, np.int64)
    np.cumsum(counts, out=indptr[1:])
    f2 = tmp_path / "proj_csr.npz"
    np.savez(f2, indptr=indptr, indices=ei[0], data=w)
    p2 = SparseProjector.from_file(f2, row_normalize=True)
    np.testing.assert_allclose(np.asarray(p2(x)), got, rtol=1e-5, atol=1e-6)

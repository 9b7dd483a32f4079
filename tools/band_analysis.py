"""Measure how block-banded the flagship graphs become under a spatial sort.

Decision tool for the fused Pallas GT-attention kernel (docs/design.md §6):
the kernel is block-sparse flash attention (splash-style) -- for each block of
Bd destination rows it visits the set of Bs-row source blocks containing any
neighbour.  That is only profitable if, after reordering nodes along a
space-filling curve, the number of source blocks per destination block (J) is
small and tight.  This script builds the three flagship edge sets (encoder
cutoff, processor multiscale, decoder KNN) at bench scale, reorders both
endpoints with a cube-sphere Morton curve, and prints the J distribution,
effective gathered width, and the dense:sparse FLOP ratio.

Run: python tools/band_analysis.py [mesh_level] [grid]
"""

from __future__ import annotations

import sys

import numpy as np


from anemoi_tpu.graphs.ordering import cube_morton_order  # noqa: E402


def analyse(name, src_of_dst_sorted_edges, dst, n_src, n_dst, bd, bs):
    """Edges must be given as (src, dst) arrays; we only need the pairing."""
    src = src_of_dst_sorted_edges
    dst_block = dst // bd
    src_block = src // bs
    nb_dst = -(-n_dst // bd)
    pair = dst_block.astype(np.int64) * ((n_src // bs) + 2) + src_block
    uniq = np.unique(pair)
    jb = uniq // ((n_src // bs) + 2)
    j_counts = np.bincount(jb.astype(np.int64), minlength=nb_dst)
    deg = np.bincount(dst, minlength=n_dst)
    e = len(src)
    jmax = int(j_counts.max())
    jmean = float(j_counts.mean())
    # FLOP ratio dense-block vs exact-sparse (per qk matmul)
    dense_rows = float((j_counts * bd * bs).sum())
    ratio = dense_rows / max(e, 1)
    pcts = {p: int(np.percentile(j_counts, p)) for p in (50, 90, 99, 100)}
    print(
        f"{name:28s} E={e:8d} N_dst={n_dst:6d} N_src={n_src:6d} "
        f"deg_max={int(deg.max()):4d} Bd={bd:4d} Bs={bs:4d} "
        f"J mean={jmean:5.2f} p50/p90/p99/max={pcts[50]}/{pcts[90]}/{pcts[99]}/{pcts[100]} "
        f"dense/sparse={ratio:6.1f}x"
    )
    return j_counts


def main():
    mesh_level = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    grid = sys.argv[2] if len(sys.argv) > 2 else "o96"

    from anemoi_tpu.graphs.create import GraphCreator

    recipe = {
        "nodes": {
            "data": {"node_builder": {"name": "ReducedGaussianGridNodes", "grid": grid}},
            "hidden": {"node_builder": {"name": "TriNodes", "resolution": mesh_level}},
        },
        "edges": [
            {"source_name": "data", "target_name": "hidden",
             "edge_builder": {"name": "CutOffEdges", "cutoff_factor": 0.6,
                              "max_num_neighbours": 32}},
            {"source_name": "hidden", "target_name": "hidden",
             "edge_builder": {"name": "MultiScaleEdges", "x_hops": 1}},
            {"source_name": "hidden", "target_name": "data",
             "edge_builder": {"name": "KNNEdges", "num_nearest_neighbours": 3}},
        ],
    }
    graph = GraphCreator(recipe).create()
    orders = {}
    inv = {}
    for nodes_name in ("data", "hidden"):
        nd = graph[nodes_name]
        lats = np.rad2deg(nd.coords[:, 0])
        lons = np.rad2deg(nd.coords[:, 1])
        order = cube_morton_order(lats, lons)
        orders[nodes_name] = order
        ranks = np.empty(len(order), dtype=np.int64)
        ranks[order] = np.arange(len(order))
        inv[nodes_name] = ranks

    for key, sub in graph.edges.items():
        s_name, t_name = key
        ei = sub.edge_index
        src = inv[s_name][ei[0]]
        dst = inv[t_name][ei[1]]
        n_src = graph[s_name].num_nodes
        n_dst = graph[t_name].num_nodes
        for bd, bs in ((128, 128), (256, 256), (128, 256), (256, 512)):
            analyse(f"{s_name}->{t_name}", src, dst, n_src, n_dst, bd, bs)
        # natural (construction) order for comparison
        analyse(f"{s_name}->{t_name} (natural)", ei[0], ei[1], n_src, n_dst, 256, 256)
        print()


if __name__ == "__main__":
    main()

"""`anemoi-tpu-graphs` CLI: create / describe / inspect graphs.

Equivalent of the reference's `anemoi-graphs` commands
(/root/reference/graphs/src/anemoi/graphs/commands/).
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="anemoi-tpu-graphs")
    sub = parser.add_subparsers(dest="command", required=True)

    p_create = sub.add_parser("create", help="Build a graph from a YAML recipe")
    p_create.add_argument("recipe", help="YAML recipe file")
    p_create.add_argument("save_path", help="Output .npz path")
    p_create.add_argument("--overwrite", action="store_true")

    p_desc = sub.add_parser("describe", help="Summarise a saved graph")
    p_desc.add_argument("graph", help="Graph .npz path")

    p_insp = sub.add_parser("inspect", help="Detailed statistics + plots")
    p_insp.add_argument("graph")
    p_insp.add_argument("--plot", default=None, help="Write a PNG overview here")

    p_exp = sub.add_parser("export_to_sparse", help="Export edge sets as scipy CSR .npz")
    p_exp.add_argument("graph")
    p_exp.add_argument("output_dir")

    p_plot = sub.add_parser(
        "plot", help="Render node maps, edge maps, and attribute distributions"
    )
    p_plot.add_argument("graph")
    p_plot.add_argument("output_dir")
    p_plot.add_argument("--max-edges", type=int, default=3000)

    args = parser.parse_args(argv)

    if args.command == "create":
        from anemoi_tpu.graphs.create import GraphCreator, describe
        from anemoi_tpu.utils.config import load_config

        cfg = load_config(args.recipe)
        graph = GraphCreator(cfg.to_dict()).create(args.save_path, overwrite=args.overwrite)
        print(describe(graph))
        print(f"saved -> {args.save_path}")
        return 0

    if args.command == "describe":
        from anemoi_tpu.graphs.create import describe
        from anemoi_tpu.graphs.graph import Graph

        print(describe(Graph.load(args.graph)))
        return 0

    if args.command == "inspect":
        import json

        from anemoi_tpu.graphs.graph import Graph
        from anemoi_tpu.graphs.inspect_tools import edge_statistics, plot_graph

        graph = Graph.load(args.graph)
        print(json.dumps(edge_statistics(graph), indent=1))
        if args.plot:
            path = plot_graph(graph, args.plot)
            print(f"plot -> {path}")
        return 0

    if args.command == "plot":
        import os as _os

        from anemoi_tpu.graphs.graph import Graph
        from anemoi_tpu.graphs import plotting

        graph = Graph.load(args.graph)
        _os.makedirs(args.output_dir, exist_ok=True)
        written = []
        for name in graph.nodes:
            p = _os.path.join(args.output_dir, f"nodes_{name}.png")
            plotting.plot_nodes(graph, name, out_file=p)
            written.append(p)
        for key in graph.edges:
            p = _os.path.join(args.output_dir, f"edges_{key[0]}_to_{key[1]}.png")
            plotting.plot_subgraph(graph, key, out_file=p, max_edges=args.max_edges)
            written.append(p)
        for fn, fname in (
            (plotting.plot_isolated_nodes, "isolated_nodes.png"),
            (plotting.plot_distribution_node_attributes, "node_attributes.png"),
            (plotting.plot_distribution_edge_attributes, "edge_attributes.png"),
        ):
            p = _os.path.join(args.output_dir, fname)
            fn(graph, out_file=p)
            written.append(p)
        for p in written:
            print(f"plot -> {p}")
        return 0

    if args.command == "export_to_sparse":
        from anemoi_tpu.graphs.graph import Graph
        from anemoi_tpu.graphs.inspect_tools import export_to_sparse

        written = export_to_sparse(Graph.load(args.graph), args.output_dir)
        for key, path in written.items():
            print(f"{key} -> {path}")
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())

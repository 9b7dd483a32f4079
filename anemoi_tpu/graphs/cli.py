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

    return 1


if __name__ == "__main__":
    sys.exit(main())

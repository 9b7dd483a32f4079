"""Multi-host scaling arithmetic for the "edges" (halo-exchange) strategy.

BASELINE.md's north star claims >=80% scaling efficiency to a v5p slice at
N320; this tool backs (or revises) that number with the actual partition
tables: for each model-shard count it builds the real halo tables
(parallel/partition.py, the same code the training step uses), counts the
exchanged bytes per train step, converts them to ICI time on published
per-link bandwidths, and compares against the measured single-chip step time
scaled by 1/S.

Reference analogue: the halo machinery sized in
/root/reference/models/src/anemoi/models/distributed/halo.py:106-224 (the
reference never publishes this arithmetic; we do).

Model (documented in docs/distributed.md):
- exchanges/step: processor layers x 4 (k,v forward + dk,dv backward) +
  2 mapper blocks x 4 on their bipartite partitions.  Per-layer remat
  (save_attention) replays the pre-attention forward inside the backward,
  re-running the k/v exchange: +2/layer, reported as the remat column.
- per-exchange off-chip bytes per chip: (S-1) * h_pair * H*D * dtype_bytes
  (the all_to_all keeps the self-slice on chip; padded rows ARE transmitted,
  which is what the tables really do).
- ICI time: bytes / (2 links * per-link one-way bandwidth) -- contiguous
  spatial shards sit on a ring, so each chip drains its halo over both
  neighbour links.  v5e: 45 GB/s/link; v5p: 90 GB/s/link (scaling-book
  numbers).
- compute time: measured single-chip step time / S (dst rows split evenly
  by construction -- partition_graph balances n_local).
- without halo_overlap: T = T_comp/S + T_halo (serial).
- with halo_overlap (the default): the all_to_all runs concurrently with
  interior attention, so T = max(T_halo, attn_frac*int_frac*T_comp/S)
  + (1 - attn_frac*int_frac)*T_comp/S, where int_frac is the measured
  interior-destination fraction from the split tables and attn_frac the
  attention share of the step (xplane: ~0.6 at n320).

Run (CPU, no TPU needed -- pure table math):
    python tools/scaling_projection.py [--grid n320] [--mesh-level 6]
        [--channels 512] [--layers 16] [--step-ms 931] [--shards 2,4,8]
"""

from __future__ import annotations

import argparse

import numpy as np


#: one-way per-link ICI bandwidth (bytes/s) and usable links on the ring
ICI = {
    "v5e": (45e9, 2),
    "v5p": (90e9, 2),
}


def halo_stats(edge_index, dst_ptr, num_dst, n_shards, num_src=None):
    from anemoi_tpu.parallel.halo import interior_boundary_rows
    from anemoi_tpu.parallel.partition import partition_graph

    sg = partition_graph(
        edge_index.astype(np.int64), dst_ptr.astype(np.int64), num_dst,
        n_shards, halo=True, num_src_nodes=num_src,
    )
    interior, boundary = interior_boundary_rows(sg)
    n_int = sum(len(r) for r in interior)
    n_bnd = sum(len(r) for r in boundary)
    return sg.h_pair, n_int / max(n_int + n_bnd, 1)


def project(args):
    from anemoi_tpu.graphs.create import GraphCreator
    from anemoi_tpu.models.graph import build_model_graph

    ea = {"edge_length": {"name": "EdgeLength"}, "edge_dirs": {"name": "EdgeDirection"}}
    recipe = {
        "nodes": {
            "data": {"node_builder": {"name": "ReducedGaussianGridNodes", "grid": args.grid}},
            "hidden": {"node_builder": {"name": "TriNodes", "resolution": args.mesh_level}},
        },
        "edges": [
            {"source_name": "data", "target_name": "hidden",
             "edge_builder": {"name": "CutOffEdges", "cutoff_factor": 0.6,
                              "max_num_neighbours": 32}, "attributes": ea},
            {"source_name": "hidden", "target_name": "hidden",
             "edge_builder": {"name": "MultiScaleEdges", "x_hops": 1}, "attributes": ea},
            {"source_name": "hidden", "target_name": "data",
             "edge_builder": {"name": "KNNEdges", "num_nearest_neighbours": 3},
             "attributes": ea},
        ],
        "post_processors": [
            {"name": "SortNodesBySpaceFillingCurve", "nodes_name": "hidden"}
        ],
    }
    print(f"building {args.grid}/ico-{args.mesh_level} graph ...", flush=True)
    graph = GraphCreator(recipe).create()
    mg = build_model_graph(graph)
    proc = mg.processor
    enc = mg.encoder["data"]
    dec = mg.decoder["data"]
    HD = args.channels
    dtype_bytes = 2  # bf16

    print(
        f"\ngrid={args.grid} N_data={mg.num_nodes['data']} "
        f"N_hidden={mg.num_nodes['hidden']} E_proc={proc.num_edges} "
        f"channels={HD} layers={args.layers} step_ms(1 chip)={args.step_ms}"
    )
    hdr = (
        f"{'S':>2} {'h_pair':>7} {'int%':>5} {'MB/x':>7} {'GB/step':>8} "
        + "".join(
            f"{c + ' t_halo':>12} {c + ' eff':>9} {c + ' eff(ovl)':>11}"
            for c in ICI
        )
    )
    print("\n" + hdr)
    rows = []
    for S in args.shards:
        h_proc, int_frac = halo_stats(proc.edge_index, proc.dst_ptr, proc.num_dst, S)
        h_enc, _ = halo_stats(enc.edge_index, enc.dst_ptr, enc.num_dst, S,
                              num_src=enc.num_src)
        h_dec, _ = halo_stats(dec.edge_index, dec.dst_ptr, dec.num_dst, S,
                              num_src=dec.num_src)
        per_x = lambda h: (S - 1) * h * HD * dtype_bytes  # noqa: E731
        n_x = args.layers * (6 if args.remat else 4)
        bytes_step = n_x * per_x(h_proc) + 4 * (per_x(h_enc) + per_x(h_dec))
        t_comp = args.step_ms / S  # ms
        line = (
            f"{S:>2} {h_proc:>7} {int_frac * 100:>4.0f}% "
            f"{per_x(h_proc) / 1e6:>7.2f} {bytes_step / 1e9:>8.3f} "
        )
        out = {"S": S, "h_pair": h_proc, "int_frac": int_frac,
               "bytes_per_step": bytes_step}
        for chip, (bw, links) in ICI.items():
            t_halo = bytes_step / (bw * links) * 1e3  # ms
            eff_serial = t_comp / (t_comp + t_halo)
            # overlap: halo hides under interior attention
            t_attn_int = args.attn_frac * int_frac * t_comp
            t_ovl = max(t_halo, t_attn_int) + (t_comp - t_attn_int)
            eff_ovl = t_comp / t_ovl
            line += f"{t_halo:>10.2f}ms {eff_serial * 100:>8.1f}% {eff_ovl * 100:>10.1f}%"
            out[chip] = {"t_halo_ms": t_halo, "eff_serial": eff_serial,
                         "eff_overlap": eff_ovl}
        print(line)
        rows.append(out)
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--grid", default="n320")
    p.add_argument("--mesh-level", type=int, default=6)
    p.add_argument("--channels", type=int, default=512)
    p.add_argument("--layers", type=int, default=16)
    p.add_argument("--step-ms", type=float, default=931.0,
                   help="measured single-chip train step (ms)")
    p.add_argument("--attn-frac", type=float, default=0.6,
                   help="attention-kernel share of the step (xplane r4)")
    p.add_argument("--remat", action="store_true",
                   help="count the save_attention remat's extra k/v replay exchange")
    p.add_argument("--shards", type=lambda s: [int(x) for x in s.split(",")],
                   default=[2, 4, 8])
    project(p.parse_args())


if __name__ == "__main__":
    main()

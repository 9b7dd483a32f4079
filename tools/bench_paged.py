"""Benchmark the fused paged Pallas GT-attention kernel against the padded
XLA path at flagship processor scale (ico-5 multiscale mesh, 512ch/16 heads).

Each path runs in its preferred node order: degree-sorted + bucketed tables
for the padded path, space-filling-curve order for the paged kernel.

Run on the TPU: python tools/bench_paged.py [fwd|grad]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np


def spatial_order(coords_rad: np.ndarray) -> np.ndarray:
    from tools.band_analysis import cube_morton_order

    lats = np.rad2deg(coords_rad[:, 0])
    lons = np.rad2deg(coords_rad[:, 1])
    return cube_morton_order(lats, lons)


def time_fn(fn, *args, steps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / steps * 1000


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "grad"
    level = int(os.environ.get("BENCH_MESH_LEVEL", "5"))
    hd = int(os.environ.get("BENCH_CHANNELS", "512"))
    h = int(os.environ.get("BENCH_HEADS", "16"))
    dtype = jnp.bfloat16

    from anemoi_tpu.graphs.create import GraphCreator
    from anemoi_tpu.ops.padded import (
        PaddedCSR, build_bucketed_tables, padded_gt_attention_bucketed,
    )
    from anemoi_tpu.ops.pallas.paged_gt import (
        PagedTables, build_paged_csr, paged_gt_attention_flat,
    )

    recipe = {
        "nodes": {"hidden": {"node_builder": {"name": "TriNodes", "resolution": level}}},
        "edges": [
            {"source_name": "hidden", "target_name": "hidden",
             "edge_builder": {"name": "MultiScaleEdges", "x_hops": 1}},
        ],
        "post_processors": [
            {"name": "SortNodesByIncomingDegree", "nodes_name": "hidden"},
        ],
    }
    g_deg = GraphCreator(recipe).create()
    es = g_deg.edges[("hidden", "hidden")]
    n = g_deg["hidden"].num_nodes
    ei_deg, ptr_deg = es.edge_index, es.dst_ptr
    e_cnt = ei_deg.shape[1]
    print(f"mesh: {n} nodes, {e_cnt} edges", file=sys.stderr)

    # paged tables in spatial order
    recipe.pop("post_processors")
    g_sp = GraphCreator(recipe).create()
    order = spatial_order(g_sp["hidden"].coords)
    rank = np.empty(n, dtype=np.int64)
    rank[order] = np.arange(n)
    ei_sp0 = g_sp.edges[("hidden", "hidden")].edge_index
    src_sp, dst_sp = rank[ei_sp0[0]], rank[ei_sp0[1]]
    o = np.lexsort((src_sp, dst_sp))
    ei_sp = np.stack([src_sp[o], dst_sp[o]])

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(n, hd)), dtype)
    k = jnp.asarray(rng.normal(size=(n, hd)), dtype)
    v = jnp.asarray(rng.normal(size=(n, hd)), dtype)
    e_feat = rng.normal(size=(e_cnt, hd)).astype(np.float32)

    # --- padded path (degree-sorted, bucketed, fused backward)
    tables, spans, src_tables, src_spans, src_rank = build_bucketed_tables(
        ei_deg, ptr_deg, num_src=n, sort_src_by_out_degree=True
    )
    e_dev = jnp.asarray(e_feat, dtype)

    def padded_fwd(q, k, v, e):
        return padded_gt_attention_bucketed(
            q, k, v, e, h, tables, spans, src_tables, src_spans, src_rank
        )

    def padded_loss(q, k, v, e):
        return jnp.sum(padded_fwd(q, k, v, e).astype(jnp.float32))

    # --- paged kernel (spatial order)
    import ast
    combos = ast.literal_eval(os.environ.get(
        "PAGED_COMBOS",
        "((128,256,128),(128,512,256),(256,512,256),(256,1024,256),(512,512,256),(256,512,512))",
    ))
    for bd, page, r in combos:
        pcsr = build_paged_csr(ei_sp, n, n, bd=bd, page=page, r=r)
        waste = pcsr.num_flat / e_cnt
        print(f"paged bd={bd} page={page} r={r}: slots={pcsr.num_slots} "
              f"pad={waste:.2f}x", file=sys.stderr)
        e_slots = jnp.asarray(pcsr.pad_edge_array(e_feat), dtype)
        fused = os.environ.get("PAGED_FUSED", "0") == "1"
        tab = PagedTables.from_csr(pcsr, fused_bwd=fused)

        stab = os.environ.get("PAGED_STABILIZE", "1") == "1"

        def paged_fwd(q, k, v, e_s, tab=tab):
            return paged_gt_attention_flat(q, k, v, e_s, h, tab, stab)

        def paged_loss(q, k, v, e_s, tab=tab):
            return jnp.sum(paged_fwd(q, k, v, e_s, tab).astype(jnp.float32))

        if mode == "fwd":
            ms = time_fn(jax.jit(paged_fwd), q, k, v, e_slots)
        else:
            ms = time_fn(jax.jit(jax.grad(paged_loss, argnums=(0, 1, 2, 3))),
                         q, k, v, e_slots)
        # gather-bound roofline: the kernel's minimum HBM traffic is the K/V
        # page DMAs (pairs x page x HD x 2 arrays) + the slotted edge
        # features + q read/out write; fwd distance from that bound is the
        # "speed of light" gap (docs/benchmarking.md)
        hd = q.shape[-1]
        el = 2 if dtype == jnp.bfloat16 else 4
        bytes_fwd = (
            pcsr.num_pairs * page * hd * 2 * el
            + pcsr.num_flat * hd * el
            + 2 * n * hd * el
        )
        if mode == "fwd":
            from anemoi_tpu.utils.costs import chip_peaks

            gbs = bytes_fwd / (ms / 1e3) / 1e9
            # MXU bound: the one-hot iota-compare gathers ARE matmuls —
            # per slot: k,v gathers 2*(2*r*page*HD), dst scatter 2*bd*r*HD,
            # qk/weight ~2*2*r*HD (small)
            flops_fwd = pcsr.num_slots * (
                2 * (2 * r * page * hd) + 2 * bd * r * hd
            )
            tfs = flops_fwd / (ms / 1e3) / 1e12
            peaks = chip_peaks(jax.devices()[0].device_kind)
            extra = ""
            if peaks:
                extra = (f" = {gbs / (peaks[1] / 1e9) * 100:.0f}% HBM-peak, "
                         f"{tfs / (peaks[0] / 1e12) * 100:.0f}% MXU-peak")
            print(f"  paged {mode}: {ms:.3f} ms  "
                  f"(pairs={pcsr.num_pairs}, min-DMA {bytes_fwd / 1e6:.0f} MB "
                  f"@ {gbs:.0f} GB/s, gather-matmul {flops_fwd / 1e9:.0f} GF "
                  f"@ {tfs:.0f} TF/s{extra})")
        else:
            print(f"  paged {mode}: {ms:.3f} ms")

    if mode == "fwd":
        ms = time_fn(jax.jit(padded_fwd), q, k, v, e_dev)
    else:
        ms = time_fn(jax.jit(jax.grad(padded_loss, argnums=(0, 1, 2, 3))),
                     q, k, v, e_dev)
    print(f"padded {mode}: {ms:.3f} ms")


if __name__ == "__main__":
    main()

"""Analytic FLOP/byte cost model for the EncProcDec step + chip peak table.

VERDICT round-2 item: bench.py must report MFU and HBM-roofline utilisation,
not just self-relative speedups.  Primary source is XLA's own
``compiled.cost_analysis()`` (exact for the compiled program); this module
provides (a) the chip peak table that turns those into utilisations and
(b) an independent analytic estimate used as a cross-check and as fallback
when the PJRT plugin doesn't implement cost analysis.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

#: (dense peak FLOP/s at bf16, HBM bandwidth B/s) per device kind.
#: Sources: published TPU specs (v5e: 197 bf16 TFLOP/s, 819 GB/s;
#: v4: 275/1228; v5p: 459/2765; v6e: 918/1640).  The axon "TPU v5 lite"
#: device kind is v5e-class.
CHIP_PEAKS: Dict[str, Tuple[float, float]] = {
    "TPU v5 lite": (197e12, 819e9),
    "TPU v5e": (197e12, 819e9),
    "TPU v4": (275e12, 1228e9),
    "TPU v5p": (459e12, 2765e9),
    "TPU v6 lite": (918e12, 1640e9),
    "TPU v6e": (918e12, 1640e9),
}


def chip_peaks(device_kind: str) -> Optional[Tuple[float, float]]:
    """(peak_flops, peak_hbm_bytes_per_s) for a device kind, longest-prefix
    matched; env overrides BENCH_PEAK_TFLOPS / BENCH_PEAK_HBM_GBS win."""
    import os

    flops = os.environ.get("BENCH_PEAK_TFLOPS")
    bw = os.environ.get("BENCH_PEAK_HBM_GBS")
    if flops and bw:
        return float(flops) * 1e12, float(bw) * 1e9
    best = None
    for kind, peaks in CHIP_PEAKS.items():
        if device_kind.startswith(kind) and (best is None or len(kind) > len(best[0])):
            best = (kind, peaks)
    if best is None:
        return None
    peak_f, peak_b = best[1]
    if flops:
        peak_f = float(flops) * 1e12
    if bw:
        peak_b = float(bw) * 1e9
    return peak_f, peak_b


def estimate_train_step_flops(
    graph,
    channels: int,
    num_layers: int,
    rollout: int = 1,
    batch: int = 1,
    ensemble: int = 1,
    hidden_name: str = "hidden",
    data_name: str = "data",
    mlp_ratio: float = 4.0,
    kind: str = "gt",
    window: int = 512,
) -> float:
    """Analytic FLOPs of one training step (fwd + bwd ~ 3x fwd) of the
    GraphTransformer EncProcDec.

    Per GT block over N_dst destinations, N_src sources, E edges, width C:
      q projection          2*C^2*N_dst
      k,v,e projections     2*C^2*(2*N_src + E_attr->C is folded into e)
      edge bias projection  2*C^2*E is NOT done per edge (edge attrs are
                            C-wide after embedding); counted as 2*C^2*E_emb
                            only once at graph embed time -> ignored (small)
      attention             ~6*E*C   (qk dot + softmax weight + v gather-sum)
      output projection     2*C^2*N_dst
      MLP (ratio r)         2*2*r*C^2*N_dst
    """
    C = channels

    def gt_block(n_dst: int, n_src: int, e: int) -> float:
        proj = 2 * C * C * (n_dst + 2 * n_src)  # q on dst; k,v on src
        attn = 6.0 * e * C
        out = 2 * C * C * n_dst
        mlp = 2 * 2 * mlp_ratio * C * C * n_dst
        return proj + attn + out + mlp

    def transformer_block(n: int) -> float:
        """Dense block-banded window attention (models/layers/attention.py):
        each query attends [prev, self, next] blocks of width `window`."""
        keys = min(3 * window, n)
        proj = 2 * C * C * 3 * n  # fused qkv
        attn = 4.0 * n * keys * C  # qk^T + alpha*v
        out = 2 * C * C * n
        mlp = 2 * 2 * mlp_ratio * C * C * n
        return proj + attn + out + mlp

    def gnn_block(n_dst: int, n_src: int, e: int, first: bool = False) -> float:
        """GraphConv block (graph_blocks.py:440-518, mlp_hidden_ratio 1):
        edge MLP [3C->C->C->C] per edge + node MLP [2C->C->C->C] per dst."""
        edge_mlp = 2.0 * e * (3 * C * C + C * C + C * C)
        node_mlp = 2.0 * n_dst * (2 * C * C + C * C + C * C)
        emb = 2.0 * e * 2 * C * C if first else 0.0  # raw-attr embed approx
        return edge_mlp + node_mlp + emb

    node_names = getattr(graph, "nodes", None)
    if node_names is None:  # duck-typed mapping graph
        node_names = [k for k in graph if isinstance(k, str)]
    if hidden_name in node_names:
        n_data = graph[data_name].num_nodes
        n_hidden = graph[hidden_name].num_nodes
        e_enc = graph[(data_name, hidden_name)].num_edges
        e_proc = graph[(hidden_name, hidden_name)].num_edges
        e_dec = graph[(hidden_name, data_name)].num_edges
        if kind == "gnn":
            fwd = (
                gnn_block(n_hidden, n_data, e_enc, first=True)
                + num_layers * gnn_block(n_hidden, n_hidden, e_proc)
                + gnn_block(n_data, n_hidden, e_dec, first=True)
            )
        else:
            proc = (
                transformer_block(n_hidden)
                if kind == "transformer"
                else gt_block(n_hidden, n_hidden, e_proc)
            )
            fwd = (
                gt_block(n_hidden, n_data, e_enc)  # encoder mapper
                + num_layers * proc  # processor
                + gt_block(n_data, n_hidden, e_dec)  # decoder mapper
            )
    else:
        # multi-level graph (hierarchical V-cycle: hidden_0..hidden_k):
        # same-level edge sets carry a num_layers-deep processor stack,
        # every other edge set one mapper block
        fwd = 0.0
        edge_items = (
            graph.edges.items()
            if hasattr(graph, "edges")
            else [(k, v) for k, v in graph.items() if isinstance(k, tuple)]
        )
        for (src, dst), es in edge_items:
            mult = num_layers if src == dst else 1
            fwd += mult * gt_block(
                graph[dst].num_nodes, graph[src].num_nodes, es.num_edges
            )
    # backward ~ 2x forward; rollout multiplies everything
    return 3.0 * fwd * rollout * batch * ensemble

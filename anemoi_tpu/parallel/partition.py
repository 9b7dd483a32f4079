"""Graph partitioning for model-parallel (spatial) sharding.

TPU-native equivalent of the reference's graph partition / halo machinery
(/root/reference/models/src/anemoi/models/distributed/{khop_edges,halo,
balanced_partition}.py, SURVEY.md §2.3 "edges" strategy):

- nodes are padded to a multiple of the model-axis size and split into equal
  contiguous shards (XLA needs identical shapes per device -- the uneven
  balanced partitions of the reference become equal padded shards with masks),
- dst-sorted edges split at shard boundaries (O(1) thanks to the dst-sort
  invariant, ref khop_edges.py:37-48), padded to the max per-shard count,
- for the halo strategy, each shard's non-local source nodes are enumerated
  per peer shard into fixed-size send/recv tables (ref halo.py:25-106), so
  the runtime exchange is a single `lax.all_to_all` of equal-shaped buffers.

Everything here is host-side numpy, computed once at model build.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import numpy as np

from anemoi_tpu.ops.padded import PaddedCSR


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclass(frozen=True)
class ShardedGraph:
    """Per-shard padded tables, stacked on a leading shard axis.

    With `halo`: src ids in ``csr_*`` tables are LOCAL ids into
    [local nodes | halo buffer] of size n_local + h_max.
    Without: src ids are GLOBAL (use with an all-gathered source array).
    """

    n_shards: int
    n_local: int  # padded nodes per shard
    n_total_padded: int
    node_mask: np.ndarray  # [S, n_local] valid-node mask
    # stacked PaddedCSR-style tables [S, ...]
    src_slots: np.ndarray
    edge_slots: np.ndarray
    mask: np.ndarray
    edge_attr_perm: np.ndarray  # [S, E_loc] global edge id per local edge (pad=E)
    edge_pad_mask: np.ndarray  # [S, E_loc]
    # halo exchange tables (None-size arrays when halo disabled)
    h_pair: int  # per-peer halo buffer size (padded)
    send_idx: np.ndarray  # [S, S, h_pair] LOCAL node ids this shard sends to peer j
    send_mask: np.ndarray  # [S, S, h_pair]
    # backward transpose: for each local node, slots in the flat send buffer
    send_transpose_idx: np.ndarray  # [S, n_local, T_max] flat send-slot ids (pad = S*h_pair)
    send_transpose_mask: np.ndarray  # [S, n_local, T_max]
    halo: bool = True


def partition_graph(
    edge_index: np.ndarray,
    dst_ptr: np.ndarray,
    num_nodes: int,
    n_shards: int,
    halo: bool = True,
    bucket_multiple: int = 8,
) -> ShardedGraph:
    """Partition a homogeneous dst-sorted graph across ``n_shards``."""
    num_edges = edge_index.shape[1]
    n_local = _round_up(int(np.ceil(num_nodes / n_shards)), bucket_multiple)
    n_total_padded = n_local * n_shards
    node_mask = (
        np.arange(n_total_padded).reshape(n_shards, n_local) < num_nodes
    )

    # per-shard edge ranges via the CSR pointer (O(1) slicing)
    bounds = [int(dst_ptr[min(s * n_local, num_nodes)]) for s in range(n_shards + 1)]
    counts = np.diff(bounds)
    e_loc_raw = int(counts.max()) if len(counts) else 1

    # build per-shard local CSRs
    shard_csrs: List[PaddedCSR] = []
    shard_edge_perm: List[np.ndarray] = []
    k_in_max = 1
    for s in range(n_shards):
        lo, hi = bounds[s], bounds[s + 1]
        ei = edge_index[:, lo:hi]
        dst_local = ei[1] - s * n_local  # local dst id
        # note: dst ids < num_nodes so dst_local in [0, n_local)
        deg = np.bincount(dst_local, minlength=n_local)
        k_in_max = max(k_in_max, int(deg.max()) if len(deg) else 1)
        shard_edge_perm.append(np.arange(lo, hi))
    k_in = _round_up(k_in_max, bucket_multiple)

    src_slots = np.zeros((n_shards, n_local, k_in), dtype=np.int32)
    edge_slots_arr = np.full((n_shards, n_local, k_in), 0, dtype=np.int32)
    mask = np.zeros((n_shards, n_local, k_in), dtype=bool)
    e_loc = _round_up(max(e_loc_raw, 1), bucket_multiple)
    edge_attr_perm = np.full((n_shards, e_loc), num_edges, dtype=np.int32)
    edge_pad_mask = np.zeros((n_shards, e_loc), dtype=bool)

    halo_src_lists: List[np.ndarray] = []
    for s in range(n_shards):
        lo, hi = bounds[s], bounds[s + 1]
        ei = edge_index[:, lo:hi]
        ne = hi - lo
        dst_local = (ei[1] - s * n_local).astype(np.int64)
        within = np.zeros(ne, dtype=np.int64)
        # position within each dst's segment (edges dst-sorted)
        if ne:
            seg_start = np.r_[0, np.flatnonzero(np.diff(dst_local)) + 1]
            seg_id = np.zeros(ne, dtype=np.int64)
            seg_id[seg_start[1:]] = 1
            seg_id = np.cumsum(seg_id)
            within = np.arange(ne) - seg_start[seg_id]
        edge_attr_perm[s, :ne] = np.arange(lo, hi)
        edge_pad_mask[s, :ne] = True
        # local edge slot ids [n_local, k_in]
        edge_slots_arr[s][dst_local, within] = np.arange(ne, dtype=np.int32)
        mask[s][dst_local, within] = True
        src_slots[s][dst_local, within] = ei[0]  # GLOBAL src for now
        halo_src_lists.append(ei[0])

    # local edge-slot table: edge ids local to the shard. Convert to the
    # flat-slot convention used by padded ops: edge_slots indexes a local
    # edge-feature array of length e_loc (+pad row).
    for s in range(n_shards):
        pad_val = e_loc
        es = edge_slots_arr[s]
        es = np.where(mask[s], es, pad_val)
        edge_slots_arr[s] = es

    if not halo:
        sg = ShardedGraph(
            n_shards=n_shards,
            n_local=n_local,
            n_total_padded=n_total_padded,
            node_mask=node_mask,
            src_slots=src_slots,
            edge_slots=edge_slots_arr,
            mask=mask,
            edge_attr_perm=edge_attr_perm,
            edge_pad_mask=edge_pad_mask,
            h_pair=0,
            send_idx=np.zeros((n_shards, n_shards, 0), np.int32),
            send_mask=np.zeros((n_shards, n_shards, 0), bool),
            send_transpose_idx=np.zeros((n_shards, n_local, 0), np.int32),
            send_transpose_mask=np.zeros((n_shards, n_local, 0), bool),
            halo=False,
        )
        return sg

    # --- halo tables ---------------------------------------------------
    # for each (owner j -> consumer s): nodes owned by j that s's edges read
    needed = [[np.array([], dtype=np.int64)] * n_shards for _ in range(n_shards)]
    h_pair_max = 1
    for s in range(n_shards):
        srcs = np.unique(halo_src_lists[s])
        owner = srcs // n_local
        for j in range(n_shards):
            if j == s:
                continue
            sel = srcs[owner == j]
            needed[s][j] = sel
            h_pair_max = max(h_pair_max, len(sel))
    h_pair = _round_up(h_pair_max, bucket_multiple)

    # send_idx[j, s]: local ids shard j sends to shard s  (row j = my sends)
    send_idx = np.zeros((n_shards, n_shards, h_pair), dtype=np.int32)
    send_mask = np.zeros((n_shards, n_shards, h_pair), dtype=bool)
    for j in range(n_shards):
        for s in range(n_shards):
            sel = needed[s][j] if s != j else np.array([], dtype=np.int64)
            send_idx[j, s, : len(sel)] = (sel - j * n_local).astype(np.int32)
            send_mask[j, s, : len(sel)] = True

    # remap each shard's global src ids -> [local | halo buffer] ids.
    # Halo buffer layout on shard s: concat over peers j (incl. self slot,
    # which stays masked) of the received h_pair rows, i.e. global position
    # of node g owned by j != s: n_local + j*h_pair + position in needed[s][j].
    for s in range(n_shards):
        remap = {}
        for j in range(n_shards):
            if j == s:
                continue
            for pos, g in enumerate(needed[s][j]):
                remap[int(g)] = n_local + j * h_pair + pos
        flat = src_slots[s].reshape(-1)
        out = np.empty_like(flat)
        local_lo = s * n_local
        for i, g in enumerate(flat):
            if local_lo <= g < local_lo + n_local:
                out[i] = g - local_lo
            else:
                out[i] = remap.get(int(g), 0)
        src_slots[s] = out.reshape(n_local, k_in)
    src_slots = np.where(mask, src_slots, 0)

    # backward transpose: per local node, the flat send-buffer slots using it
    t_counts = np.zeros((n_shards, n_local), dtype=np.int64)
    entries = [[[] for _ in range(n_local)] for _ in range(n_shards)]
    for j in range(n_shards):
        for s in range(n_shards):
            for pos in range(h_pair):
                if send_mask[j, s, pos]:
                    node = send_idx[j, s, pos]
                    entries[j][node].append(s * h_pair + pos)
                    t_counts[j, node] += 1
    t_max = _round_up(max(1, int(t_counts.max())), 4)
    send_transpose_idx = np.full(
        (n_shards, n_local, t_max), n_shards * h_pair, dtype=np.int32
    )
    send_transpose_mask = np.zeros((n_shards, n_local, t_max), dtype=bool)
    for j in range(n_shards):
        for node in range(n_local):
            lst = entries[j][node]
            send_transpose_idx[j, node, : len(lst)] = lst
            send_transpose_mask[j, node, : len(lst)] = True

    return ShardedGraph(
        n_shards=n_shards,
        n_local=n_local,
        n_total_padded=n_total_padded,
        node_mask=node_mask,
        src_slots=src_slots,
        edge_slots=edge_slots_arr,
        mask=mask,
        edge_attr_perm=edge_attr_perm,
        edge_pad_mask=edge_pad_mask,
        h_pair=h_pair,
        send_idx=send_idx,
        send_mask=send_mask,
        send_transpose_idx=send_transpose_idx,
        send_transpose_mask=send_transpose_mask,
        halo=True,
    )

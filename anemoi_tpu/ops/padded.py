"""Padded-CSR sparse graph ops: the TPU-native, scatter-free formulation.

Scatters are slow on TPU (serialized updates + very slow XLA compiles on some
toolchains); gathers + dense masked math are fast.  Because the framework
invariant keeps edges dst-sorted with a CSR ``dst_ptr``, every destination's
incoming edges can be laid out as padded neighbour tables computed once on the
host:

    dst side (forward):   src_slots/edge_slots/mask        [N_dst, K_in]
    src side (backward):  src_gather_slots/src_gather_mask [N_src, K_out]
                          (flat indices into the [N_dst*K_in] slot space)
    edge side (backward): edge_gather_slot                 [E]

With both table sets, attention AND its VJP are pure gathers + dense masked
reductions -- no scatter appears in forward or backward XLA programs.  The
custom VJPs below implement exactly that (the same two-pass structure as the
reference's Triton backward, models/src/anemoi/models/triton/gt.py:183-389,
re-derived for gather-only hardware).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclass(frozen=True)
class PaddedCSR:
    """Host-precomputed padded neighbour tables for one dst-sorted edge set."""

    # forward (by destination)
    edge_slots: np.ndarray  # [N_dst, K_in] int32, pad = num_edges
    src_slots: np.ndarray  # [N_dst, K_in] int32 source node per slot, pad = 0
    mask: np.ndarray  # [N_dst, K_in] bool
    # backward (by source): flat indices into the [N_dst * K_in] slot space
    src_gather_slots: np.ndarray  # [N_src, K_out] int32, pad = N_dst*K_in
    src_gather_mask: np.ndarray  # [N_src, K_out] bool
    # backward (by edge): each edge's flat slot index
    edge_gather_slot: np.ndarray  # [E] int32
    edge_dst: np.ndarray  # [E] int32 (dst node per edge)
    edge_src: np.ndarray  # [E] int32 (src node per edge)
    num_edges: int
    num_src: int

    @property
    def num_dst(self) -> int:
        return int(self.edge_slots.shape[0])

    @property
    def max_in_degree(self) -> int:
        return int(self.edge_slots.shape[1])

    @property
    def max_degree(self) -> int:  # backwards-compat alias
        return self.max_in_degree

    @property
    def max_out_degree(self) -> int:
        return int(self.src_gather_slots.shape[1])

    @classmethod
    def from_edge_index(
        cls,
        edge_index: np.ndarray,
        dst_ptr: np.ndarray,
        num_src: int,
        k_multiple: int = 1,
        k_in: Optional[int] = None,
    ) -> "PaddedCSR":
        """Build all tables from dst-sorted edges + CSR pointer.

        ``k_in`` overrides the padded in-degree (required when several shards
        must share one flat-slot indexing space).  ``k_multiple`` rounds the
        padded degrees; 1 (exact max degree) is optimal -- the flat
        [N*K, HD] gather layout needs no K alignment (rows are rows), only
        dst-RANGE boundaries need 8-alignment, which compute_buckets keeps."""
        num_dst = len(dst_ptr) - 1
        num_edges = int(edge_index.shape[1])
        src = edge_index[0]
        dst = edge_index[1]

        in_deg = np.diff(dst_ptr)
        if k_in is None:
            k_in = _round_up(int(max(1, in_deg.max() if len(in_deg) else 1)), k_multiple)
        else:
            assert k_in >= (in_deg.max() if len(in_deg) else 0)

        edge_slots = np.full((num_dst, k_in), num_edges, dtype=np.int32)
        src_slots = np.zeros((num_dst, k_in), dtype=np.int32)
        mask = np.zeros((num_dst, k_in), dtype=bool)
        within = np.arange(num_edges) - dst_ptr[dst]
        edge_slots[dst, within] = np.arange(num_edges, dtype=np.int32)
        src_slots[dst, within] = src
        mask[dst, within] = True

        # flat slot index per edge (into [N_dst * K_in])
        edge_gather_slot = (dst * k_in + within).astype(np.int32)

        # src-side transpose tables
        out_deg = np.bincount(src, minlength=num_src)
        k_out = _round_up(int(max(1, out_deg.max() if num_edges else 1)), k_multiple)
        src_gather_slots = np.full((num_src, k_out), num_dst * k_in, dtype=np.int32)
        src_gather_mask = np.zeros((num_src, k_out), dtype=bool)
        order = np.argsort(src, kind="stable")
        src_sorted = src[order]
        src_ptr = np.zeros(num_src + 1, dtype=np.int64)
        np.cumsum(out_deg, out=src_ptr[1:])
        within_src = np.arange(num_edges) - src_ptr[src_sorted]
        src_gather_slots[src_sorted, within_src] = edge_gather_slot[order]
        src_gather_mask[src_sorted, within_src] = True

        return cls(
            edge_slots=edge_slots,
            src_slots=src_slots,
            mask=mask,
            src_gather_slots=src_gather_slots,
            src_gather_mask=src_gather_mask,
            edge_gather_slot=edge_gather_slot,
            edge_dst=dst.astype(np.int32),
            edge_src=src.astype(np.int32),
            num_edges=num_edges,
            num_src=num_src,
        )


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class PaddedTables:
    """Device-side table pytree (flows through jit/remat/vmap)."""

    src_slots: jnp.ndarray
    edge_slots: jnp.ndarray
    mask: jnp.ndarray
    src_gather_slots: jnp.ndarray
    src_gather_mask: jnp.ndarray
    edge_gather_slot: jnp.ndarray
    edge_dst: jnp.ndarray
    edge_src: jnp.ndarray

    @classmethod
    def from_csr(cls, csr: PaddedCSR) -> "PaddedTables":
        return cls(
            src_slots=jnp.asarray(csr.src_slots),
            edge_slots=jnp.asarray(csr.edge_slots),
            mask=jnp.asarray(csr.mask),
            src_gather_slots=jnp.asarray(csr.src_gather_slots),
            src_gather_mask=jnp.asarray(csr.src_gather_mask),
            edge_gather_slot=jnp.asarray(csr.edge_gather_slot),
            edge_dst=jnp.asarray(csr.edge_dst),
            edge_src=jnp.asarray(csr.edge_src),
        )

    def tree_flatten(self):
        return (
            (
                self.src_slots,
                self.edge_slots,
                self.mask,
                self.src_gather_slots,
                self.src_gather_mask,
                self.edge_gather_slot,
                self.edge_dst,
                self.edge_src,
            ),
            None,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


# ----------------------------------------------------------------------
# scatter-free primitives
# ----------------------------------------------------------------------
def _gather_rows(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """x[idx] for a 2-D index table idx: returns idx.shape + x.shape[1:]."""
    return jnp.take(x, idx.reshape(-1), axis=0).reshape(idx.shape + x.shape[1:])


def _slot_sum_to_src(flat_slots: jnp.ndarray, tables: PaddedTables) -> jnp.ndarray:
    """Sum per-slot values [N_dst*K_in(+1), ...] into source nodes -- the
    gather-only transpose of the src->slot broadcast."""
    g = _gather_rows(flat_slots, tables.src_gather_slots)  # [Ns, K_out, ...]
    m = tables.src_gather_mask.reshape(
        tables.src_gather_mask.shape + (1,) * (g.ndim - 2)
    )
    return jnp.sum(jnp.where(m, g, 0.0), axis=1)


def _pad_flat(x_slots: jnp.ndarray) -> jnp.ndarray:
    """[Nd, K, ...] -> [Nd*K + 1, ...] with a zero pad row for masked gathers."""
    flat = x_slots.reshape((-1,) + x_slots.shape[2:])
    return jnp.concatenate([flat, jnp.zeros((1,) + flat.shape[1:], flat.dtype)], axis=0)


# ----------------------------------------------------------------------
# graph-transformer attention with gather-only VJP
# ----------------------------------------------------------------------
# TPU layout note: every gathered tensor stays 2-D [rows, H*D] (lane dim a
# multiple of 128) -- gathers into [rows, H, D] with D=16/32 minor waste 4-8x
# of the vector lanes AND force transposed gather layouts (observed 4.4 ms vs
# 0.5 ms per gather at o32/mesh4 scale).  Head structure is recovered with
# free row-major reshapes; reductions run over the trailing D lanes.


def _nbr_flat(x_flat, tables):
    """Gather per-slot neighbour rows: [Ns, HD] -> [Nd*K, HD]."""
    return jnp.take(x_flat, tables.src_slots.reshape(-1), axis=0)


def _edge_flat(e_flat, tables):
    """Gather per-slot edge rows: [E, HD] (+pad row) -> [Nd*K, HD]."""
    e_pad = jnp.concatenate(
        [e_flat, jnp.zeros((1, e_flat.shape[1]), e_flat.dtype)], axis=0
    )
    return jnp.take(e_pad, tables.edge_slots.reshape(-1), axis=0)


def _mask3(tables, n, k, h):
    return tables.mask.reshape(n, k, 1)


def _head_reducer(num_heads: int, d: int, dtype):
    """[HD, H] 0/1 indicator: x @ G sums each head's d lanes.

    Reducing [rows, HD] -> [rows, H] via reshape+reduce forces a lane retile
    on TPU (observed ~0.5 ms per op at flagship scale); the indicator matmul
    stays in the native [*, 128k] layout and runs on the MXU."""
    hd = num_heads * d
    g = jnp.zeros((hd, num_heads), dtype=dtype)
    idx = jnp.arange(hd) // d
    return g.at[jnp.arange(hd), idx].set(1.0)


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def padded_gt_attention_flat(query, key, value, edge_attr, num_heads, tables):
    out, _ = _gt_fwd_impl(query, key, value, edge_attr, num_heads, tables)
    return out


def _gt_fwd_impl(query, key, value, edge_attr, num_heads, tables):
    """query [Nd,HD]; key/value [Ns,HD]; edge_attr [E,HD] or None. All flat.

    k and v are gathered TOGETHER as one [Ns, 2*HD] table read (half the
    gather ops on the gather-bound TPU path), then split."""
    n, hd = query.shape
    h = num_heads
    d = hd // h
    k_dim = tables.src_slots.shape[1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, dtype=query.dtype))

    kv = jnp.concatenate([key, value], axis=-1)  # [Ns, 2*HD]
    kv_nbr = _nbr_flat(kv, tables)  # [N*K, 2*HD]
    k_nbr, v_nbr = kv_nbr[:, :hd], kv_nbr[:, hd:]
    if edge_attr is not None:
        e_nbr = _edge_flat(edge_attr, tables)
        k_nbr = k_nbr + e_nbr
        v_nbr = v_nbr + e_nbr

    g_red = _head_reducer(h, d, query.dtype)  # [HD, H]
    # logits[n,k,h] = sum_d q . k_nbr  (indicator matmul: no lane retiling)
    q_rep = jnp.repeat(query, k_dim, axis=0)  # [N*K, HD] (row-broadcast)
    logits = jnp.dot(
        q_rep * k_nbr, g_red, preferred_element_type=jnp.float32
    ).reshape(n, k_dim, h).astype(query.dtype) * scale
    mask = _mask3(tables, n, k_dim, h)
    logits = jnp.where(mask, logits, -jnp.inf)
    lmax = jnp.max(logits, axis=1, keepdims=True)
    lmax = jnp.where(jnp.isfinite(lmax), lmax, 0.0)
    ex = jnp.where(mask, jnp.exp(logits - lmax), 0.0)
    denom = jnp.maximum(jnp.sum(ex, axis=1, keepdims=True), 1e-16)
    alpha = ex / denom  # [N, K, H]

    # broadcast alpha over each head's d lanes via the transposed indicator
    alpha_rep = jnp.dot(
        alpha.reshape(n * k_dim, h), g_red.T, preferred_element_type=jnp.float32
    ).astype(query.dtype)  # [N*K, HD]
    out = jnp.sum((alpha_rep * v_nbr).reshape(n, k_dim, hd), axis=1)
    return out, alpha


def _gt_fwd(query, key, value, edge_attr, num_heads, tables):
    out, alpha = _gt_fwd_impl(query, key, value, edge_attr, num_heads, tables)
    return out, (query, key, value, edge_attr, alpha, tables)


def _gt_bwd_core(query, key, value, edge_attr, alpha, num_heads, tables, g):
    """Shared per-table backward: recompute neighbour gathers, produce the
    query grad and the per-SLOT kv grad [N*K, 2*HD] (not yet reduced to
    sources -- the caller owns the transpose reduction)."""
    n, hd = query.shape
    h = num_heads
    d = hd // h
    k_dim = tables.src_slots.shape[1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, dtype=query.dtype))

    # recompute gathered neighbours (one fused flat gather for k and v)
    kv = jnp.concatenate([key, value], axis=-1)
    kv_nbr = _nbr_flat(kv, tables)
    k_nbr, v_nbr = kv_nbr[:, :hd], kv_nbr[:, hd:]
    if edge_attr is not None:
        e_nbr = _edge_flat(edge_attr, tables)
        k_nbr = k_nbr + e_nbr
        v_nbr = v_nbr + e_nbr

    g_red = _head_reducer(h, d, query.dtype)  # [HD, H]
    alpha_flat = jnp.dot(
        alpha.reshape(n * k_dim, h), g_red.T, preferred_element_type=jnp.float32
    ).astype(query.dtype)  # [N*K, HD]
    g_rep = jnp.repeat(g, k_dim, axis=0)  # [N*K, HD]

    d_v_nbr = alpha_flat * g_rep  # [N*K, HD]
    d_alpha = jnp.dot(
        g_rep * v_nbr, g_red, preferred_element_type=jnp.float32
    ).reshape(n, k_dim, h).astype(query.dtype)  # [N,K,H]
    inner = jnp.sum(alpha * d_alpha, axis=1, keepdims=True)
    d_logits = alpha * (d_alpha - inner)
    d_logits = jnp.where(_mask3(tables, n, k_dim, h), d_logits, 0.0)
    d_logits_rep = jnp.dot(
        d_logits.reshape(n * k_dim, h), g_red.T, preferred_element_type=jnp.float32
    ).astype(query.dtype) * scale

    q_rep = jnp.repeat(query, k_dim, axis=0)
    d_query = jnp.sum((d_logits_rep * k_nbr).reshape(n, k_dim, hd), axis=1)
    d_k_nbr = d_logits_rep * q_rep  # [N*K, HD]

    # d_k and d_v fused into one double-width slot grad
    dkv = jnp.concatenate([d_k_nbr, d_v_nbr], axis=-1)  # [N*K, 2*HD]
    return d_query, dkv


def _gt_bwd(num_heads, res, g):
    query, key, value, edge_attr, alpha, tables = res
    hd = query.shape[1]
    d_query, dkv = _gt_bwd_core(query, key, value, edge_attr, alpha, num_heads, tables, g)

    # transpose the slot grads back to sources / edges -- gather-only
    dkv_flat = jnp.concatenate([dkv, jnp.zeros((1, 2 * hd), dkv.dtype)], axis=0)
    dkv_src = _slot_sum_to_src(dkv_flat, tables)
    d_key, d_value = dkv_src[:, :hd], dkv_src[:, hd:]
    if edge_attr is not None:
        dkv_edge = jnp.take(dkv_flat, tables.edge_gather_slot, axis=0)
        d_edge = dkv_edge[:, :hd] + dkv_edge[:, hd:]
    else:
        d_edge = None
    return d_query, d_key, d_value, d_edge, None


padded_gt_attention_flat.defvjp(_gt_fwd, _gt_bwd)


def padded_gt_attention(query, key, value, edge_attr, tables):
    """Head-structured wrapper: q [Nd,H,D], k/v [Ns,H,D], e [E,H,D]."""
    n, h, d = query.shape
    out = padded_gt_attention_flat(
        query.reshape(n, h * d),
        key.reshape(key.shape[0], h * d),
        value.reshape(value.shape[0], h * d),
        None if edge_attr is None else edge_attr.reshape(edge_attr.shape[0], h * d),
        h,
        tables,
    )
    return out.reshape(n, h, d)


# ----------------------------------------------------------------------
# edge-message aggregation with gather-only VJP
# ----------------------------------------------------------------------
@jax.custom_vjp
def padded_conv_aggregate(messages, tables):
    """sum of per-edge messages into destinations; messages [E, C] dst-sorted."""
    m_pad = jnp.concatenate(
        [messages, jnp.zeros((1,) + messages.shape[1:], messages.dtype)], axis=0
    )
    gathered = _gather_rows(m_pad, tables.edge_slots)  # [Nd, K, C]
    gathered = jnp.where(tables.mask[..., None], gathered, 0.0)
    return jnp.sum(gathered, axis=1)


def _agg_fwd(messages, tables):
    return padded_conv_aggregate(messages, tables), tables


def _agg_bwd(tables, g):
    # d_messages[e] = g[dst(e)] -- a pure gather
    return jnp.take(g, tables.edge_dst, axis=0), None


padded_conv_aggregate.defvjp(_agg_fwd, _agg_bwd)


@jax.custom_vjp
def gather_src_to_edges(x_src, tables):
    """x_src[src(e)] per edge, with a gather-only backward.

    Forward: [Ns, C] -> [E, C] (gather by edge source).
    Backward: sum of edge grads into sources via the src-side tables.
    """
    return jnp.take(x_src, tables.edge_src, axis=0)


def _gse_fwd(x_src, tables):
    return gather_src_to_edges(x_src, tables), tables


def _gse_bwd(tables, g):
    # gather-only: per source, sum the grads of its out-edges.  The src-side
    # table holds flat SLOT ids; map slot -> edge id via edge_slots (with the
    # pad slot mapping to the zero pad row of g).
    num_edges = g.shape[0]
    slot_to_edge = jnp.concatenate(
        [tables.edge_slots.reshape(-1),
         jnp.asarray([num_edges], dtype=tables.edge_slots.dtype)]
    )
    edge_ids = jnp.take(slot_to_edge, tables.src_gather_slots, axis=0)  # [Ns, K_out]
    g_pad = jnp.concatenate([g, jnp.zeros((1,) + g.shape[1:], g.dtype)], axis=0)
    gathered = _gather_rows(g_pad, edge_ids)
    m = tables.src_gather_mask.reshape(
        tables.src_gather_mask.shape + (1,) * (gathered.ndim - 2)
    )
    return (jnp.sum(jnp.where(m, gathered, 0.0), axis=1), None)


gather_src_to_edges.defvjp(_gse_fwd, _gse_bwd)


@jax.custom_vjp
def gather_dst_to_edges(x_dst, tables):
    """x_dst[dst(e)] per edge, with a gather-only backward (padded aggregate)."""
    return jnp.take(x_dst, tables.edge_dst, axis=0)


def _gde_fwd(x_dst, tables):
    return gather_dst_to_edges(x_dst, tables), tables


def _gde_bwd(tables, g):
    return padded_conv_aggregate(g, tables), None


gather_dst_to_edges.defvjp(_gde_fwd, _gde_bwd)


# ----------------------------------------------------------------------
# compatibility wrappers (csr-object API used by older call sites/tests)
# ----------------------------------------------------------------------
def padded_gt_attention_csr(query, key, value, edge_attr, csr: PaddedCSR):
    return padded_gt_attention(query, key, value, edge_attr, PaddedTables.from_csr(csr))


def padded_graph_conv_aggregate(messages, csr=None, edge_slots=None, mask=None, tables=None):
    if tables is None:
        tables = PaddedTables.from_csr(csr)
    return padded_conv_aggregate(messages, tables)


# ----------------------------------------------------------------------
# degree-bucketed tables: cut padding waste on skewed in-degrees
# ----------------------------------------------------------------------
def compute_buckets(
    in_deg: np.ndarray, max_buckets: int = 3, bucket_multiple: int = 8,
    k_multiple: int = 1,
):
    """Choose contiguous dst ranges minimising padded gather volume.

    Hidden-mesh in-degrees are highly skewed (hub nodes from coarse levels);
    padding everyone to the max wastes 4-5x of the gather traffic.  After a
    degree sort (graphs.post_process.SortNodesByIncomingDegree) 2-3 buckets
    recover ~2x.  Returns [(start, end, k)] covering [0, N).

    Range BOUNDARIES stay multiples of ``bucket_multiple`` (row slices at
    unaligned offsets retile on TPU) but each range's k is exact
    (``k_multiple=1``): the flat [rows, HD] tables need no K alignment."""
    n = len(in_deg)
    if n == 0:
        return [(0, 0, max(1, k_multiple))]

    def k_of(lo, hi):
        m = int(in_deg[lo:hi].max()) if hi > lo else 1
        return _round_up(max(m, 1), k_multiple)

    if max_buckets <= 1 or n < 4 * bucket_multiple:
        return [(0, n, k_of(0, n))]

    # candidate boundaries on a quantile grid (round to bucket_multiple rows)
    cands = sorted(
        {min(n, _round_up(int(n * q / 64.0), bucket_multiple)) for q in range(1, 64)}
    )
    best = [(0, n, k_of(0, n))]
    best_vol = n * best[0][2]
    for i, b1 in enumerate(cands):
        for b2 in cands[i:]:
            if max_buckets < 3 and b2 != b1:
                continue
            parts = [(0, b1), (b1, b2), (b2, n)]
            parts = [(lo, hi) for lo, hi in parts if hi > lo]
            vol = sum((hi - lo) * k_of(lo, hi) for lo, hi in parts)
            if vol < best_vol:
                best_vol = vol
                best = [(lo, hi, k_of(lo, hi)) for lo, hi in parts]
    return best


def build_bucketed_tables(
    edge_index: np.ndarray,
    dst_ptr: np.ndarray,
    num_src: int,
    max_buckets: int = 3,
    bucket_multiple: int = 8,
    k_multiple: int = 1,
    sort_src_by_out_degree: bool = False,
):
    """Returns (tables_tuple, spans, src_tables, src_spans, src_rank).

    - tables_tuple: per-bucket PaddedTables (pytree / jit argument)
    - spans: STATIC (dst_lo, dst_hi, edge_lo, edge_hi) per bucket
    - src_tables: per-SRC-RANGE (slots, mask) pairs indexing the GLOBAL flat
      slot space (all buckets' [n_b*k_b] slot spaces concatenated, one shared
      pad row at the end) -- the backward kv reduction gathers these
    - src_spans: STATIC (src_lo, src_hi, k_out) per src range
    - src_rank: [num_src] position of each natural src row in the reduction's
      row order (None when ``sort_src_by_out_degree`` is off)

    Each bucket covers a contiguous dst range; because edges are dst-sorted,
    its edges are the contiguous slice [dst_ptr[start], dst_ptr[end]) -- so
    per-bucket edge features are static slices, not gathers.

    The src side is range-bucketed too: per-bucket transpose tables pad every
    source to that bucket's max out-degree ([num_src, k_out_b] EACH, ~10x the
    forward volume on hub buckets), while ranges over the (degree-sorted)
    source axis with per-range k_out bring the backward gather volume back to
    the forward's.

    ``sort_src_by_out_degree`` virtually re-sorts the SOURCE rows by
    descending out-degree before range-bucketing, so ranges capture out-degree
    skew even when the natural src order is arbitrary (mapper sub-graphs: the
    hidden mesh is sorted by PROCESSOR in-degree, which says nothing about
    decoder out-degree; a KNN-3 decoder's k_out=44 full-width table gathered
    3.7x the forward volume, profiled at ~7 ms/step flagship).  The backward
    then un-permutes the reduced rows with one cheap [num_src, C] gather."""
    in_deg = np.diff(dst_ptr)
    buckets = compute_buckets(in_deg, max_buckets, bucket_multiple, k_multiple)
    num_edges = int(edge_index.shape[1])
    tables = []
    spans = []
    glob_slot = np.empty(num_edges, dtype=np.int64)
    offset = 0
    for lo, hi, k in buckets:
        e_lo, e_hi = int(dst_ptr[lo]), int(dst_ptr[hi])
        ei = edge_index[:, e_lo:e_hi].copy()
        ei[1] = ei[1] - lo  # dst local to the bucket
        ptr = (dst_ptr[lo : hi + 1] - e_lo).astype(np.int64)
        csr = PaddedCSR.from_edge_index(ei, ptr, num_src=num_src, k_in=k)
        tables.append(PaddedTables.from_csr(csr))
        spans.append((int(lo), int(hi), e_lo, e_hi))
        glob_slot[e_lo:e_hi] = csr.edge_gather_slot.astype(np.int64) + offset
        offset += (hi - lo) * k
    total_slots = offset

    # global src-side transpose table over the concatenated slot space,
    # row-bucketed into contiguous src ranges with per-range k_out
    src = edge_index[0]
    out_deg = np.bincount(src, minlength=num_src)
    if sort_src_by_out_degree:
        src_order = np.argsort(-out_deg, kind="stable")  # row order of the reduction
        src_rank_np = np.empty(num_src, dtype=np.int64)
        src_rank_np[src_order] = np.arange(num_src)
        row_of = src_rank_np  # natural src id -> reduction row
        out_deg_rows = out_deg[src_order]  # descending
        src_rank = jnp.asarray(src_rank_np.astype(np.int32))
    else:
        row_of = np.arange(num_src)
        out_deg_rows = out_deg
        src_rank = None
    # wide enough for any src-range's rounded k_r (ranges slice [:k_r] below)
    k_out = _round_up(int(max(1, out_deg.max() if num_edges else 1)), k_multiple)
    src_gather = np.full((num_src, k_out), total_slots, dtype=np.int32)
    src_mask = np.zeros((num_src, k_out), dtype=bool)
    order = np.argsort(src, kind="stable")
    src_sorted = src[order]
    src_ptr = np.zeros(num_src + 1, dtype=np.int64)
    np.cumsum(out_deg, out=src_ptr[1:])
    within_src = np.arange(num_edges) - src_ptr[src_sorted]
    src_gather[row_of[src_sorted], within_src] = glob_slot[order].astype(np.int32)
    src_mask[row_of[src_sorted], within_src] = True
    src_buckets = compute_buckets(out_deg_rows, max_buckets, bucket_multiple, k_multiple)
    assert all(k <= k_out for _, _, k in src_buckets), (src_buckets, k_out)
    src_tables = tuple(
        (jnp.asarray(src_gather[lo:hi, :k]), jnp.asarray(src_mask[lo:hi, :k]))
        for lo, hi, k in src_buckets
    )
    src_spans = tuple((int(lo), int(hi), int(k)) for lo, hi, k in src_buckets)
    return tuple(tables), tuple(spans), src_tables, src_spans, src_rank


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _gt_bucketed_fused(
    query, key, value, edge_attr, num_heads, spans, src_spans, tables_tuple,
    src_tables, src_rank,
):
    out, _ = _gt_bucketed_fwd_impl(
        query, key, value, edge_attr, num_heads, spans, tables_tuple
    )
    return out


def _gt_bucketed_fwd_impl(query, key, value, edge_attr, num_heads, spans, tables_tuple):
    outs = []
    alphas = []
    for (lo, hi, e_lo, e_hi), tables in zip(spans, tables_tuple):
        e_b = None if edge_attr is None else edge_attr[e_lo:e_hi]
        o, a = _gt_fwd_impl(query[lo:hi], key, value, e_b, num_heads, tables)
        outs.append(o)
        alphas.append(a)
    return jnp.concatenate(outs, axis=0), tuple(alphas)


def _gt_bucketed_fwd(
    query, key, value, edge_attr, num_heads, spans, src_spans, tables_tuple,
    src_tables, src_rank,
):
    out, alphas = _gt_bucketed_fwd_impl(
        query, key, value, edge_attr, num_heads, spans, tables_tuple
    )
    return out, (
        query, key, value, edge_attr, alphas, tables_tuple, src_tables, src_rank
    )


def _gt_bucketed_bwd(num_heads, spans, src_spans, res, g):
    query, key, value, edge_attr, alphas, tables_tuple, src_tables, src_rank = res
    hd = query.shape[1]

    d_qs = []
    slot_chunks = []
    for (lo, hi, e_lo, e_hi), tables, alpha in zip(spans, tables_tuple, alphas):
        e_b = None if edge_attr is None else edge_attr[e_lo:e_hi]
        d_q_b, dkv_b = _gt_bwd_core(
            query[lo:hi], key, value, e_b, alpha, num_heads, tables, g[lo:hi]
        )
        d_qs.append(d_q_b)
        slot_chunks.append(dkv_b)
    d_query = jnp.concatenate(d_qs, axis=0)

    # ONE transpose reduction over the global flat slot space, gathered per
    # src range (k_out matched to the range) instead of per bucket at the
    # global k_out -- 3-4x less backward gather traffic on skewed meshes
    dkv_flat = jnp.concatenate(
        slot_chunks + [jnp.zeros((1, 2 * hd), slot_chunks[0].dtype)], axis=0
    )
    parts = []
    for (lo, hi, k_r), (slots, mask) in zip(src_spans, src_tables):
        gathered = jnp.take(dkv_flat, slots.reshape(-1), axis=0).reshape(
            hi - lo, k_r, 2 * hd
        )
        parts.append(jnp.sum(jnp.where(mask[..., None], gathered, 0.0), axis=1))
    dkv_src = jnp.concatenate(parts, axis=0)
    if src_rank is not None:
        # ranges were built over out-degree-SORTED rows; one gather restores
        # the natural src order
        dkv_src = jnp.take(dkv_src, src_rank, axis=0)
    d_key, d_value = dkv_src[:, :hd], dkv_src[:, hd:]

    if edge_attr is not None:
        d_es = []
        offset = 0
        for (lo, hi, e_lo, e_hi), tables in zip(spans, tables_tuple):
            ids = tables.edge_gather_slot + offset
            dkv_e = jnp.take(dkv_flat, ids, axis=0)
            d_es.append(dkv_e[:, :hd] + dkv_e[:, hd:])
            offset += (hi - lo) * tables.src_slots.shape[1]
        d_edge = jnp.concatenate(d_es, axis=0)
    else:
        d_edge = None
    return d_query, d_key, d_value, d_edge, None, None, None


_gt_bucketed_fused.defvjp(_gt_bucketed_fwd, _gt_bucketed_bwd)


def padded_gt_attention_bucketed(
    query, key, value, edge_attr, num_heads, tables_tuple, spans,
    src_tables=None, src_spans=None, src_rank=None,
):
    """Bucketed flat attention: per-bucket calls over contiguous dst/edge
    slices.  With ``src_tables``/``src_spans`` (from build_bucketed_tables)
    the whole op is one custom VJP whose kv-grad reduction runs once over the
    global slot space with src-range-matched padding; without them, AD
    accumulates per-bucket full-width reductions (legacy path).
    ``src_rank`` (sort_src_by_out_degree tables): reduction rows are
    out-degree-sorted; the backward un-permutes them with one gather.

    ``spans``: STATIC tuple of (dst_lo, dst_hi, edge_lo, edge_hi) per bucket
    (must be static so the per-bucket shapes are compile-time constants);
    ``tables_tuple``: matching tuple of PaddedTables (pytree, jit argument)."""
    if src_tables is not None:
        return _gt_bucketed_fused(
            query, key, value, edge_attr, num_heads, tuple(spans), tuple(src_spans),
            tables_tuple, src_tables, src_rank,
        )
    outs = []
    for (lo, hi, e_lo, e_hi), tables in zip(spans, tables_tuple):
        e_b = None if edge_attr is None else edge_attr[e_lo:e_hi]
        outs.append(
            padded_gt_attention_flat(query[lo:hi], key, value, e_b, num_heads, tables)
        )
    return jnp.concatenate(outs, axis=0)


def padded_gt_attention_bucketed_heads(
    query, key, value, edge_attr, tables_tuple, spans, src_tables=None,
    src_spans=None, src_rank=None,
):
    """Head-structured bucketed wrapper: q [Nd,H,D], k/v [Ns,H,D], e [E,H,D]."""
    n, h, d = query.shape
    out = padded_gt_attention_bucketed(
        query.reshape(n, h * d),
        key.reshape(key.shape[0], h * d),
        value.reshape(value.shape[0], h * d),
        None if edge_attr is None else edge_attr.reshape(edge_attr.shape[0], h * d),
        h,
        tables_tuple,
        spans,
        src_tables=src_tables,
        src_spans=src_spans,
        src_rank=src_rank,
    )
    return out.reshape(n, h, d)

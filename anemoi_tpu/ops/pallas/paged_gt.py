"""Fused paged graph-transformer attention (Pallas/Mosaic TPU kernel).

The TPU answer to the reference's Triton CSC kernel
(/root/reference/models/src/anemoi/models/triton/gt.py:82-391): per-destination
softmax attention over incoming graph edges, fused so the gathered neighbour
tensors never touch HBM.  Mosaic has no in-kernel random row gather (measured:
``jnp.take``/``take_along_axis`` fail to lower on this toolchain), so the
kernel is built from three TPU-native mechanisms instead:

1. **Paged indirection** -- nodes are ordered along a space-filling curve
   (graphs.post_process) so each block of ``bd`` destinations draws its
   neighbours from a handful of ``page``-row source blocks.  A scalar-prefetch
   ``page_ids`` array drives the kv BlockSpec index map, exactly like the
   splash/paged-attention reference kernels: the Mosaic pipeline DMAs one page
   per grid step, double-buffered.

2. **One-hot matmul gathers** -- within a (dst-block, page) *slot* of up to
   ``r`` edges, rows are gathered from the VMEM-resident page by an
   iota-compare one-hot [r, page] matmul: contraction width >=128 is a perfect
   MXU tile, and 0/1 x bf16 products are exact.  The same trick broadcasts
   per-destination quantities to edge rows (``oq @ x``) and reduces edge rows
   to destinations (``dot(oq, x, contract rows)``).  Per-head H -> H*D lane
   broadcasts are one-hot matmuls too (exact for bf16 values and for the
   power-of-two shift corrections).

3. **Mean-shift online softmax** -- softmax needs a per-destination shift, but
   a per-destination *max* cannot be produced by matmuls.  Softmax is
   shift-invariant, so the kernel uses the per-destination *mean* logit
   (computable with one-hot matmuls) as the stabiliser, maintained online
   across slots with flash-attention-style accumulator corrections.  This is
   exact (not an approximation); it only requires the within-destination
   logit spread to stay inside the fp32 exp range, which any trained attention
   distribution satisfies.  With qk-norm (bounded logits) the shift machinery
   can be compiled out entirely (``stabilize=False``).

The grid is a ragged 1-D walk over the slots of all destination blocks (no
padding to a max page count per block): per-block accumulators live in VMEM
scratch, outputs are revolving blocks flushed when the walk enters the next
destination block.

Edge features ride in *slot layout* ``[n_slots*r, HD]`` (zero-padded, built
once at graph construction) so they stream through contiguous BlockSpecs and
are added to gathered k and v in VMEM -- per-edge attention bias costs no
scatter at all.

Backward (same two-pass structure as the reference Triton kernel, re-derived
for gather-only hardware): the first kernel walks slots in forward order,
accumulating dq per destination block and writing per-slot dkv rows
contiguously (these ARE the edge-feature grads); the second kernel walks the
same slots sorted by PAGE, reducing the slot-space kv grads into source nodes
with transposed one-hot matmuls and revolving page outputs.  No scatter
appears anywhere, and no XLA-side gather reduction is needed.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name

try:  # keep importable where pallas is unavailable
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    PALLAS_AVAILABLE = True
except Exception:  # pragma: no cover
    PALLAS_AVAILABLE = False


# ----------------------------------------------------------------------
# host-side table construction
# ----------------------------------------------------------------------
@dataclass(frozen=True)
class PagedCSR:
    """Host-precomputed slot tables for one edge set (see module docstring)."""

    blk_ids: np.ndarray  # [S] int32 dst block per slot (non-decreasing)
    page_ids: np.ndarray  # [S] int32 src page per slot
    idx: np.ndarray  # [S, 2, r] int32: [s,0]=within-page col (pad=page),
    #                                  [s,1]=within-block dst row (pad=bd)
    visit_slot: np.ndarray  # [S] slot ids sorted by page (backward kv walk)
    visit_page: np.ndarray  # [S] page of each visit (non-decreasing)
    slot_pos: np.ndarray  # [E] flat slot-space position of each ORIGINAL edge
    inv_slot: np.ndarray  # [num_slots*r] edge id at each slot position (pad=E)
    num_src: int
    num_dst: int
    bd: int
    page: int
    r: int

    @property
    def num_slots(self) -> int:
        return int(self.blk_ids.shape[0])

    @property
    def num_pairs(self) -> int:
        """Distinct (dst-block, src-page) pairs = page-DMA count per K/V
        array (the kernel's gather-bound roofline term)."""
        return len(
            np.unique(self.blk_ids.astype(np.int64) * (2**31) + self.page_ids)
        )

    @property
    def num_flat(self) -> int:
        return self.num_slots * self.r

    def pad_edge_array(self, x: np.ndarray) -> np.ndarray:
        """Scatter a canonical (dst-sorted) per-edge array into slot layout
        ``[num_slots*r, ...]`` with zero padding (host, build time only)."""
        out = np.zeros((self.num_flat,) + x.shape[1:], dtype=x.dtype)
        out[self.slot_pos] = x
        return out


def build_paged_csr(
    edge_index: np.ndarray,
    num_src: int,
    num_dst: int,
    bd: int = 128,
    page: int = 256,
    r: int = 128,
) -> PagedCSR:
    """Build slot tables from edges in their canonical (dst-sorted) order.

    Slots are the ragged list of (dst-block, src-page) pairs, each holding at
    most ``r`` edges (larger pairs repeat the page over several slots)."""
    src = np.asarray(edge_index[0], dtype=np.int64)
    dst = np.asarray(edge_index[1], dtype=np.int64)
    e = len(src)
    blk = dst // bd
    pg = src // page
    order = np.lexsort((dst, pg, blk))  # kernel edge order
    blk_o, pg_o, src_o, dst_o = blk[order], pg[order], src[order], dst[order]

    # pair boundaries -> slot of each (ordered) edge
    pair_change = np.empty(e, dtype=bool)
    if e:
        pair_change[0] = True
        pair_change[1:] = (blk_o[1:] != blk_o[:-1]) | (pg_o[1:] != pg_o[:-1])
    pair_id = np.cumsum(pair_change) - 1
    pair_start = np.flatnonzero(pair_change)
    within_pair = np.arange(e) - pair_start[pair_id]
    slot_in_pair = within_pair // r
    within_slot = within_pair % r
    # global slot ids: pairs expand to ceil(count/r) slots each
    pair_counts = np.diff(np.append(pair_start, e))
    pair_slots = -(-pair_counts // r)
    pair_slot_offset = np.concatenate([[0], np.cumsum(pair_slots)])[:-1]
    slot_of_edge = pair_slot_offset[pair_id] + slot_in_pair
    num_slots = int(pair_slots.sum()) if e else 0

    blk_ids = np.zeros(max(num_slots, 1), dtype=np.int32)
    page_ids = np.zeros(max(num_slots, 1), dtype=np.int32)
    idx = np.empty((max(num_slots, 1), 2, r), dtype=np.int32)
    idx[:, 0, :] = page  # col sentinel -> one-hot row of zeros
    idx[:, 1, :] = bd  # drow sentinel
    if e:
        blk_ids[slot_of_edge] = blk_o.astype(np.int32)
        page_ids[slot_of_edge] = pg_o.astype(np.int32)
        idx[slot_of_edge, 0, within_slot] = (src_o % page).astype(np.int32)
        idx[slot_of_edge, 1, within_slot] = (dst_o % bd).astype(np.int32)
    num_slots = max(num_slots, 1)

    # flat slot position of each ORIGINAL edge, and its inverse (runtime
    # slot-layout transform: both directions are pure gathers)
    slot_pos = np.zeros(e, dtype=np.int64)
    slot_pos[order] = slot_of_edge * r + within_slot
    inv_slot = np.full(num_slots * r, e, dtype=np.int64)
    inv_slot[slot_pos] = np.arange(e)

    # one sentinel all-pad slot at the end: the reduction walk visits it for
    # every source page that has NO edges, so those output pages are written
    # with zeros instead of being left as uninitialised memory
    n_pages = _cdiv(max(num_src, 1), page)
    sentinel = num_slots
    blk_ids = np.append(blk_ids, blk_ids[-1]).astype(np.int32)
    page_ids = np.append(page_ids, page_ids[-1]).astype(np.int32)
    idx = np.concatenate([idx, np.zeros_like(idx[:1])], axis=0)
    idx[sentinel, 0, :] = page
    idx[sentinel, 1, :] = bd
    num_slots += 1
    inv_slot = np.append(inv_slot, np.full(r, e, dtype=np.int64))

    # backward kv-reduction walk: the slots sorted by page, plus one sentinel
    # visit per empty page
    empty_pages = np.setdiff1d(
        np.arange(n_pages, dtype=np.int32), page_ids[:sentinel]
    )
    walk_slots = np.concatenate(
        [np.arange(sentinel, dtype=np.int32),
         np.full(len(empty_pages), sentinel, dtype=np.int32)]
    )
    walk_pages = np.concatenate([page_ids[:sentinel], empty_pages])
    vo = np.argsort(walk_pages, kind="stable")
    visit_slot = walk_slots[vo].astype(np.int32)
    visit_page = walk_pages[vo].astype(np.int32)

    # dst blocks with NO edges (tiny model-parallel shards of the
    # hierarchical levels hit this) would never be visited by the fwd/bwd
    # grids, leaving their out/lse/dq blocks uninitialised -- NaN in
    # interpret mode, arbitrary memory on chip, and the NaNs poison every
    # gradient reduced over padded rows.  Append one all-pad sentinel slot
    # per missing block so every output block is written (with zeros /
    # log-eps lse); they are excluded from the kv-reduction walk above.
    n_blocks = _cdiv(max(num_dst, 1), bd)
    missing_blocks = np.setdiff1d(
        np.arange(n_blocks, dtype=np.int32), blk_ids[:sentinel]
    )
    if len(missing_blocks):
        blk_ids = np.concatenate([blk_ids, missing_blocks]).astype(np.int32)
        page_ids = np.concatenate(
            [page_ids, np.zeros(len(missing_blocks), np.int32)]
        )
        pad_slots = np.zeros(
            (len(missing_blocks),) + idx.shape[1:], dtype=idx.dtype
        )
        pad_slots[:, 0, :] = page
        pad_slots[:, 1, :] = bd
        idx = np.concatenate([idx, pad_slots], axis=0)
        num_slots += len(missing_blocks)
        inv_slot = np.append(
            inv_slot, np.full(len(missing_blocks) * r, e, dtype=np.int64)
        )

    return PagedCSR(
        blk_ids=blk_ids,
        page_ids=page_ids,
        idx=idx,
        visit_slot=visit_slot,
        visit_page=visit_page,
        slot_pos=slot_pos,
        inv_slot=inv_slot,
        num_src=num_src,
        num_dst=num_dst,
        bd=bd,
        page=page,
        r=r,
    )


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class PagedTables:
    """Device-side pytree of the slot tables (jit argument)."""

    blk_ids: jnp.ndarray  # [S] int32
    page_ids: jnp.ndarray  # [S] int32
    idx: jnp.ndarray  # [S, 2, r] int32
    visit_slot: jnp.ndarray  # [S] int32
    visit_page: jnp.ndarray  # [S] int32
    slot_gather: Optional[jnp.ndarray] = None  # [S*r] edge id per slot (pad=E)
    edge_slot: Optional[jnp.ndarray] = None  # [E] slot position per edge
    # static (aux) fields
    bd: int = 128
    page: int = 256
    r: int = 128
    num_src: int = 0
    num_dst: int = 0
    # fused backward: the kv-grad reduction recomputes attention per
    # page-sorted visit instead of reading a [num_slots*r, 2HD] dkv buffer
    # written by the first pass -- trades one recompute for the dominant
    # HBM transient (unlocks small mapper pages at n320-class grids)
    fused_bwd: bool = False

    @classmethod
    def from_csr(cls, csr: PagedCSR, fused_bwd: bool = False) -> "PagedTables":
        return cls(
            blk_ids=jnp.asarray(csr.blk_ids),
            page_ids=jnp.asarray(csr.page_ids),
            idx=jnp.asarray(csr.idx),
            visit_slot=jnp.asarray(csr.visit_slot),
            visit_page=jnp.asarray(csr.visit_page),
            slot_gather=jnp.asarray(csr.inv_slot, dtype=jnp.int32),
            edge_slot=jnp.asarray(csr.slot_pos, dtype=jnp.int32),
            bd=csr.bd,
            page=csr.page,
            r=csr.r,
            num_src=csr.num_src,
            num_dst=csr.num_dst,
            fused_bwd=fused_bwd,
        )

    @property
    def num_slots(self) -> int:
        return int(self.blk_ids.shape[0])

    def tree_flatten(self):
        children = (self.blk_ids, self.page_ids, self.idx, self.visit_slot,
                    self.visit_page, self.slot_gather, self.edge_slot)
        aux = (self.bd, self.page, self.r, self.num_src, self.num_dst,
               self.fused_bwd)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


# ----------------------------------------------------------------------
# kernels
# ----------------------------------------------------------------------
def _indicator(hd: int, h: int, dtype):
    """[HD, H] 0/1 head indicator built in-kernel (no captured constants)."""
    d = hd // h
    row = jax.lax.broadcasted_iota(jnp.int32, (hd, h), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (hd, h), 1)
    return ((row // d) == col).astype(dtype)


def _indicator_t(hd: int, h: int, dtype):
    """[H, HD] transpose indicator: one-hot matmul broadcast H -> H*D lanes.

    Exact for bf16 operands (each output element is a single 1.0*x product);
    f32 values must be power-of-two (see the shift quantisation below) to
    survive the bf16 cast."""
    d = hd // h
    row = jax.lax.broadcasted_iota(jnp.int32, (h, hd), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (h, hd), 1)
    return (row == (col // d)).astype(dtype)


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _dot_t(a, b):
    """Contract over rows: [R, M]^T @ [R, N] -> [M, N] in fp32."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _clean_rows(ref, block_idx, block_rows, total_rows):
    """Zero the rows of a partial boundary block.

    OOB block rows contain arbitrary padding (NaN in interpret mode); a
    one-hot matmul over them would produce 0*NaN=NaN, so every block read
    whose array dim is not a block multiple is masked with its static size."""
    x = ref[:]
    if total_rows % block_rows == 0:
        return x
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    limit = total_rows - block_idx * block_rows
    return jnp.where(row < limit, x, 0)


def _fwd_kernel(
    blk_ref, pg_ref,  # scalar prefetch [S]
    idx_ref,  # [1, 2, r] int32
    q_ref,  # [bd, HD]
    kv_ref,  # [page, 2HD]
    e_ref,  # [r, HD] projected edge rows, OR [r, Fp] raw (fuse_edge)
    *refs,  # (w_ref [Fp, HD] when fuse_edge,) out_ref, lse_ref, scratch...
    hd: int, h: int, bd: int, page: int, r: int, scale: float,
    nd: int, ns: int, stabilize: bool, fuse_edge: bool = False,
):
    if fuse_edge:
        w_ref, out_ref, lse_ref, acc_ref, den_ref, stat_ref, shift_ref = refs
    else:
        out_ref, lse_ref, acc_ref, den_ref, stat_ref, shift_ref = refs
    s = pl.program_id(0)
    n_s = pl.num_programs(0)
    blk_here = blk_ref[s]
    first = jnp.logical_or(s == 0, blk_ref[jnp.maximum(s - 1, 0)] != blk_here)
    last = jnp.logical_or(
        s == n_s - 1, blk_ref[jnp.minimum(s + 1, n_s - 1)] != blk_here
    )
    d = hd // h

    @pl.when(first)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        den_ref[:] = jnp.zeros_like(den_ref)
        if stabilize:
            stat_ref[:] = jnp.zeros_like(stat_ref)
            shift_ref[:] = jnp.zeros_like(shift_ref)

    cols = idx_ref[0, 0, :]
    drows = idx_ref[0, 1, :]
    cdtype = q_ref.dtype
    og = (
        cols[:, None] == jax.lax.broadcasted_iota(jnp.int32, (r, page), 1)
    ).astype(cdtype)
    oq = (
        drows[:, None] == jax.lax.broadcasted_iota(jnp.int32, (r, bd), 1)
    ).astype(cdtype)
    valid = (cols[:, None] < page)  # [r, 1]

    kv_rows = _dot(og, _clean_rows(kv_ref, pg_ref[s], page, ns)).astype(
        cdtype
    )  # exact gather (one-hot)
    if fuse_edge:
        # lin_edge fused in: raw [r, Fp] slot features (incl. the bias ones-
        # lane) x resident [Fp, HD] weights -- the projected [num_flat, HD]
        # edge tensor never exists in HBM
        e_rows = _dot(e_ref[:], w_ref[:]).astype(cdtype)
    else:
        e_rows = e_ref[:]
    keff = kv_rows[:, :hd] + e_rows
    veff = kv_rows[:, hd:] + e_rows
    qrows = _dot(oq, _clean_rows(q_ref, blk_here, bd, nd)).astype(cdtype)

    g_red = _indicator(hd, h, cdtype)
    l = _dot((qrows * keff), g_red) * scale  # [r, H] fp32
    l = jnp.where(valid, l, 0.0)

    g_red_t = _indicator_t(hd, h, cdtype)
    if stabilize:
        # online mean-shift softmax: accumulate [sum_l | count] in ONE matmul.
        # The shift is quantised to multiples of ln2 so the accumulator
        # correction is an exact power of two -- representable in bf16, hence
        # the one-hot H->HD broadcast matmul is EXACT (softmax is invariant
        # to the choice of shift, so quantising it costs nothing).
        valid_h = jnp.broadcast_to(valid, (r, h)).astype(cdtype)
        stat_ref[:] += _dot_t(oq, jnp.concatenate([l.astype(cdtype), valid_h], 1))
        s_raw = stat_ref[:, :h] / jnp.maximum(stat_ref[:, h:], 1.0)
        ln2 = 0.6931471805599453
        k_steps = jnp.round((s_raw - shift_ref[:]) / ln2)
        s_new = shift_ref[:] + k_steps * ln2
        corr = jnp.exp2(-k_steps)  # exact powers of two [bd, H] fp32
        shift_ref[:] = s_new
        srows = _dot(oq.astype(jnp.float32), s_new)  # [r, H]
        p = jnp.where(valid, jnp.exp(l - srows), 0.0)  # [r, H] fp32
        den_ref[:] = den_ref[:] * corr + _dot_t(oq, p.astype(cdtype))
        prep = _dot(p.astype(cdtype), g_red_t).astype(cdtype)  # exact bf16
        corr_rep = _dot(corr.astype(cdtype), g_red_t)  # exact (powers of two)
        acc_ref[:] = acc_ref[:] * corr_rep + _dot_t(oq, prep * veff)
    else:
        # bounded logits (qk-norm): no shift machinery at all
        p = jnp.where(valid, jnp.exp(l), 0.0)
        prep = _dot(p.astype(cdtype), g_red_t).astype(cdtype)
        den_ref[:] += _dot_t(oq, p.astype(cdtype))
        acc_ref[:] += _dot_t(oq, prep * veff)

    @pl.when(last)
    def _():
        # finalize in-kernel: broadcast the [bd, H] denominator to [bd, HD]
        # with one one-hot matmul and divide, so the kernel emits the final
        # (bf16) output directly -- no fp32 numerator round-trip through HBM
        # and no XLA-side division pass over [N, HD]
        den = jnp.maximum(den_ref[:], 1e-30)
        den_b = _dot(den, _indicator_t(hd, h, jnp.float32))  # [bd, HD] fp32
        out_ref[:] = (acc_ref[:] / den_b).astype(out_ref.dtype)
        lse = jnp.log(den)
        if stabilize:
            lse = lse + shift_ref[:]
        lse_ref[:] = lse


def _bwd_kernel(
    blk_ref, pg_ref,
    idx_ref, q_ref, kv_ref, e_ref, g_ref, lse_ref, delta_ref,
    *refs,  # (w_ref [Fp, HD], wt_ref [HD, Fp] when fuse_edge;)
    #         dq_ref [bd, HD] revolving; (dkv_ref [r, 2HD] per slot unless
    #         fused backward); de_ref [r, HD] per slot = edge-feature grads
    #         (raw-feature grads [r, Fp] when fuse_edge); (dw_ref [Fp, HD]
    #         when fuse_edge); dq_acc scratch [bd, HD] fp32; (dw_acc scratch)
    hd: int, h: int, bd: int, page: int, r: int, scale: float,
    nd: int, ns: int, emit_dkv: bool = True, fuse_edge: bool = False,
):
    w_ref = wt_ref = dw_ref = dw_acc = dkv_ref = None
    if fuse_edge:
        w_ref, wt_ref = refs[:2]
        refs = refs[2:]
        if emit_dkv:
            dq_ref, dkv_ref, de_ref, dw_ref, dq_acc, dw_acc = refs
        else:
            dq_ref, de_ref, dw_ref, dq_acc, dw_acc = refs
    elif emit_dkv:
        dq_ref, dkv_ref, de_ref, dq_acc = refs
    else:
        dq_ref, de_ref, dq_acc = refs
    s = pl.program_id(0)
    n_s = pl.num_programs(0)
    blk_here = blk_ref[s]
    first = jnp.logical_or(s == 0, blk_ref[jnp.maximum(s - 1, 0)] != blk_here)
    last = jnp.logical_or(
        s == n_s - 1, blk_ref[jnp.minimum(s + 1, n_s - 1)] != blk_here
    )
    d = hd // h

    @pl.when(first)
    def _():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    if fuse_edge:

        @pl.when(s == 0)
        def _():
            dw_acc[:] = jnp.zeros_like(dw_acc)

    cols = idx_ref[0, 0, :]
    drows = idx_ref[0, 1, :]
    cdtype = q_ref.dtype
    og = (
        cols[:, None] == jax.lax.broadcasted_iota(jnp.int32, (r, page), 1)
    ).astype(cdtype)
    oq = (
        drows[:, None] == jax.lax.broadcasted_iota(jnp.int32, (r, bd), 1)
    ).astype(cdtype)
    valid = (cols[:, None] < page)

    kv_rows = _dot(og, _clean_rows(kv_ref, pg_ref[s], page, ns)).astype(cdtype)
    e_raw = e_ref[:]
    if fuse_edge:
        e_rows = _dot(e_raw, w_ref[:]).astype(cdtype)
    else:
        e_rows = e_raw
    keff = kv_rows[:, :hd] + e_rows
    veff = kv_rows[:, hd:] + e_rows
    qrows = _dot(oq, _clean_rows(q_ref, blk_here, bd, nd)).astype(cdtype)

    g_red = _indicator(hd, h, cdtype)
    l = _dot((qrows * keff), g_red) * scale  # [r, H] fp32
    lse_rows = _dot(oq.astype(jnp.float32), _clean_rows(lse_ref, blk_here, bd, nd))
    alpha = jnp.where(valid, jnp.exp(l - lse_rows), 0.0)  # [r, H] fp32
    alpha_c = alpha.astype(cdtype)

    g_red_t = _indicator_t(hd, h, cdtype)
    grows = _dot(oq, _clean_rows(g_ref, blk_here, bd, nd)).astype(cdtype)  # [r, HD]
    dveff = _dot(alpha_c, g_red_t).astype(cdtype) * grows  # [r, HD]
    dalpha = _dot((grows * veff), g_red)  # [r, H] fp32
    delta_rows = _dot(
        oq.astype(jnp.float32), _clean_rows(delta_ref, blk_here, bd, nd)
    )
    dl = alpha * (dalpha - delta_rows)  # [r, H] fp32
    dl_rep = (_dot(dl.astype(cdtype), g_red_t) * scale).astype(cdtype)
    dq_acc[:] += _dot_t(oq, dl_rep * keff)
    dkeff = dl_rep * qrows
    if emit_dkv:
        dkv_ref[:, :hd] = dkeff.astype(dkv_ref.dtype)
        dkv_ref[:, hd:] = dveff.astype(dkv_ref.dtype)
    # edge grads fused here: d_e = d_keff + d_veff (both add e_rows), so the
    # XLA side never re-reads the [num_flat, 2HD] dkv buffer to form them
    de = (dkeff + dveff).astype(cdtype)
    if fuse_edge:
        # chain through the in-kernel projection: raw-feature grads per slot
        # and the weight grad accumulated across the whole grid
        de_ref[:] = _dot(de, wt_ref[:]).astype(de_ref.dtype)
        dw_acc[:] += _dot_t(e_raw.astype(cdtype), de)
    else:
        de_ref[:] = de

    @pl.when(last)
    def _():
        dq_ref[:] = dq_acc[:].astype(dq_ref.dtype)

    if fuse_edge:

        @pl.when(s == n_s - 1)
        def _():
            dw_ref[:] = dw_acc[:].astype(dw_ref.dtype)


def _reduce_kernel(
    visit_slot_ref, visit_page_ref,  # scalar prefetch [S]
    idx_ref,  # [1, 2, r] of the visited slot
    dkv_ref,  # [r, 2HD] of the visited slot
    out_ref,  # [page, 2HD] (revolving over pages)
    acc_ref,  # scratch [page, 2HD] fp32
    *, page: int, r: int,
):
    """Reduce per-slot kv grads into source nodes: walk slots sorted by page,
    accumulate og^T @ dkv_rows per page, flush on page change."""
    t = pl.program_id(0)
    n_t = pl.num_programs(0)
    pg_here = visit_page_ref[t]
    first = jnp.logical_or(
        t == 0, visit_page_ref[jnp.maximum(t - 1, 0)] != pg_here
    )
    last = jnp.logical_or(
        t == n_t - 1, visit_page_ref[jnp.minimum(t + 1, n_t - 1)] != pg_here
    )

    @pl.when(first)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    cols = idx_ref[0, 0, :]
    og = (
        cols[:, None] == jax.lax.broadcasted_iota(jnp.int32, (r, page), 1)
    ).astype(dkv_ref.dtype)
    acc_ref[:] += _dot_t(og, dkv_ref[:])

    @pl.when(last)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _fused_reduce_kernel(
    vs_ref, vp_ref, vb_ref,  # scalar prefetch [T]: slot, page, dst block
    idx_ref,  # [1, 2, r] of the visited slot
    q_ref,  # [bd, HD] (dst block of the visited slot)
    kv_ref,  # [page, 2HD] (revolving: each page DMA'd once)
    e_ref,  # [r, HD] of the visited slot ([r, Fp] raw when fuse_edge)
    g_ref, lse_ref, delta_ref,  # [bd, HD], [bd, H], [bd, H]
    *refs,  # (w_ref [Fp, HD] when fuse_edge,) out_ref, acc_ref
    hd: int, h: int, bd: int, page: int, r: int, scale: float,
    nd: int, ns: int, fuse_edge: bool = False,
):
    if fuse_edge:
        w_ref, out_ref, acc_ref = refs
    else:
        out_ref, acc_ref = refs
    """Fused kv-grad reduction: walk slots sorted by page, RECOMPUTE the
    per-slot kv grads from the resident kv page (the same alpha/dl math as
    the first backward pass) and accumulate them into source nodes -- the
    [num_slots*r, 2HD] dkv buffer never exists in HBM.  Within a page the
    visit order preserves dst-block order (stable sort), so the q/g/lse/delta
    block DMAs stream monotonically per page segment."""
    t = pl.program_id(0)
    n_t = pl.num_programs(0)
    pg_here = vp_ref[t]
    first = jnp.logical_or(t == 0, vp_ref[jnp.maximum(t - 1, 0)] != pg_here)
    last = jnp.logical_or(
        t == n_t - 1, vp_ref[jnp.minimum(t + 1, n_t - 1)] != pg_here
    )
    blk_here = vb_ref[t]

    @pl.when(first)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    cols = idx_ref[0, 0, :]
    drows = idx_ref[0, 1, :]
    cdtype = q_ref.dtype
    og = (
        cols[:, None] == jax.lax.broadcasted_iota(jnp.int32, (r, page), 1)
    ).astype(cdtype)
    oq = (
        drows[:, None] == jax.lax.broadcasted_iota(jnp.int32, (r, bd), 1)
    ).astype(cdtype)
    valid = (cols[:, None] < page)

    kv_rows = _dot(og, _clean_rows(kv_ref, pg_here, page, ns)).astype(cdtype)
    if fuse_edge:
        e_rows = _dot(e_ref[:], w_ref[:]).astype(cdtype)
    else:
        e_rows = e_ref[:]
    keff = kv_rows[:, :hd] + e_rows
    veff = kv_rows[:, hd:] + e_rows
    qrows = _dot(oq, _clean_rows(q_ref, blk_here, bd, nd)).astype(cdtype)

    g_red = _indicator(hd, h, cdtype)
    l = _dot((qrows * keff), g_red) * scale  # [r, H] fp32
    lse_rows = _dot(oq.astype(jnp.float32), _clean_rows(lse_ref, blk_here, bd, nd))
    alpha = jnp.where(valid, jnp.exp(l - lse_rows), 0.0)  # [r, H] fp32
    alpha_c = alpha.astype(cdtype)

    g_red_t = _indicator_t(hd, h, cdtype)
    grows = _dot(oq, _clean_rows(g_ref, blk_here, bd, nd)).astype(cdtype)
    dveff = _dot(alpha_c, g_red_t).astype(cdtype) * grows  # [r, HD]
    dalpha = _dot((grows * veff), g_red)  # [r, H] fp32
    delta_rows = _dot(
        oq.astype(jnp.float32), _clean_rows(delta_ref, blk_here, bd, nd)
    )
    dl = alpha * (dalpha - delta_rows)  # [r, H] fp32
    dl_rep = (_dot(dl.astype(cdtype), g_red_t) * scale).astype(cdtype)
    dkeff = dl_rep * qrows
    acc_ref[:, :hd] += _dot_t(og, dkeff)
    acc_ref[:, hd:] += _dot_t(og, dveff)

    @pl.when(last)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


# ----------------------------------------------------------------------
# pallas_call wrappers
# ----------------------------------------------------------------------
def _cdiv(a, b):
    return -(-a // b)


def _fwd_call(q, kv, e_slots, tables: PagedTables, num_heads: int,
              interpret: bool, stabilize: bool = True, w_e=None):
    nd, hd = q.shape
    bd, page, r = tables.bd, tables.page, tables.r
    s_tot = tables.num_slots
    h = num_heads
    scale = 1.0 / float(np.sqrt(hd // h))
    fuse_edge = w_e is not None
    kernel = functools.partial(
        _fwd_kernel, hd=hd, h=h, bd=bd, page=page, r=r, scale=scale,
        nd=nd, ns=kv.shape[0], stabilize=stabilize, fuse_edge=fuse_edge,
    )
    fp = e_slots.shape[-1]
    in_specs = [
        pl.BlockSpec((1, 2, r), lambda s, blk, pg: (s, 0, 0)),
        pl.BlockSpec((bd, hd), lambda s, blk, pg: (blk[s], 0)),
        pl.BlockSpec((page, 2 * hd), lambda s, blk, pg: (pg[s], 0)),
        pl.BlockSpec((r, fp), lambda s, blk, pg: (s, 0)),
    ]
    inputs = [tables.blk_ids, tables.page_ids, tables.idx, q, kv, e_slots]
    if fuse_edge:
        in_specs.append(pl.BlockSpec((fp, hd), lambda s, blk, pg: (0, 0)))
        inputs.append(w_e)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(s_tot,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((bd, hd), lambda s, blk, pg: (blk[s], 0)),
            pl.BlockSpec((bd, h), lambda s, blk, pg: (blk[s], 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((bd, hd), jnp.float32),
            pltpu.VMEM((bd, h), jnp.float32),
            pltpu.VMEM((bd, 2 * h), jnp.float32),
            pltpu.VMEM((bd, h), jnp.float32),
        ],
    )
    nd_pad = _cdiv(nd, bd) * bd
    out, lse = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((nd_pad, hd), q.dtype),
            jax.ShapeDtypeStruct((nd_pad, h), jnp.float32),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(*inputs)
    return out[:nd], lse[:nd]


def _bwd_call(q, kv, e_slots, g, lse, delta, tables: PagedTables,
              num_heads: int, interpret: bool, emit_dkv: bool = True,
              w_e=None, wt_e=None):
    nd, hd = q.shape
    bd, page, r = tables.bd, tables.page, tables.r
    s_tot = tables.num_slots
    h = num_heads
    scale = 1.0 / float(np.sqrt(hd // h))
    fuse_edge = w_e is not None
    fp = e_slots.shape[-1]
    kernel = functools.partial(
        _bwd_kernel, hd=hd, h=h, bd=bd, page=page, r=r, scale=scale,
        nd=nd, ns=kv.shape[0], emit_dkv=emit_dkv, fuse_edge=fuse_edge,
    )
    nd_pad = _cdiv(nd, bd) * bd
    out_specs = [
        pl.BlockSpec((bd, hd), lambda s, blk, pg: (blk[s], 0)),
        pl.BlockSpec((r, 2 * hd), lambda s, blk, pg: (s, 0)),
        pl.BlockSpec((r, fp), lambda s, blk, pg: (s, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((nd_pad, hd), q.dtype),
        jax.ShapeDtypeStruct((s_tot * r, 2 * hd), q.dtype),
        jax.ShapeDtypeStruct((s_tot * r, fp), q.dtype),
    ]
    if fuse_edge:
        out_specs.append(pl.BlockSpec((fp, hd), lambda s, blk, pg: (0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((fp, hd), jnp.float32))
    if not emit_dkv:
        del out_specs[1], out_shape[1]
    in_specs = [
        pl.BlockSpec((1, 2, r), lambda s, blk, pg: (s, 0, 0)),
        pl.BlockSpec((bd, hd), lambda s, blk, pg: (blk[s], 0)),
        pl.BlockSpec((page, 2 * hd), lambda s, blk, pg: (pg[s], 0)),
        pl.BlockSpec((r, fp), lambda s, blk, pg: (s, 0)),
        pl.BlockSpec((bd, hd), lambda s, blk, pg: (blk[s], 0)),
        pl.BlockSpec((bd, h), lambda s, blk, pg: (blk[s], 0)),
        pl.BlockSpec((bd, h), lambda s, blk, pg: (blk[s], 0)),
    ]
    inputs = [tables.blk_ids, tables.page_ids, tables.idx, q, kv, e_slots,
              g, lse, delta]
    scratch = [pltpu.VMEM((bd, hd), jnp.float32)]
    if fuse_edge:
        in_specs.append(pl.BlockSpec((fp, hd), lambda s, blk, pg: (0, 0)))
        in_specs.append(pl.BlockSpec((hd, fp), lambda s, blk, pg: (0, 0)))
        inputs.extend([w_e, wt_e])
        scratch.append(pltpu.VMEM((fp, hd), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(s_tot,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
    )
    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        grid_spec=grid_spec,
        interpret=interpret,
    )(*inputs)
    dw = None
    if fuse_edge:
        *outs, dw = outs
    if emit_dkv:
        dq, dkv, de = outs
    else:
        (dq, de), dkv = outs, None
    if fuse_edge:
        return dq[:nd], dkv, de, dw
    return dq[:nd], dkv, de


def _reduce_call(dkv, tables: PagedTables, interpret: bool):
    """[num_flat, 2HD] slot grads -> [num_src, 2HD] via the page-walk kernel."""
    two_hd = dkv.shape[-1]
    page, r = tables.page, tables.r
    n_visits = int(tables.visit_slot.shape[0])
    kernel = functools.partial(_reduce_kernel, page=page, r=r)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_visits,),
        in_specs=[
            pl.BlockSpec((1, 2, r), lambda t, vs, vp: (vs[t], 0, 0)),
            pl.BlockSpec((r, two_hd), lambda t, vs, vp: (vs[t], 0)),
        ],
        out_specs=pl.BlockSpec((page, two_hd), lambda t, vs, vp: (vp[t], 0)),
        scratch_shapes=[pltpu.VMEM((page, two_hd), jnp.float32)],
    )
    ns_pad = _cdiv(tables.num_src, page) * page
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((ns_pad, two_hd), dkv.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(tables.visit_slot, tables.visit_page, tables.idx, dkv)
    return out[: tables.num_src]


def _fused_reduce_call(q, kv, e_slots, g, lse, delta, tables: PagedTables,
                       num_heads: int, interpret: bool, w_e=None):
    """[num_src, 2HD] kv grads via the recompute-and-reduce page walk."""
    nd, hd = q.shape
    bd, page, r = tables.bd, tables.page, tables.r
    h = num_heads
    scale = 1.0 / float(np.sqrt(hd // h))
    fuse_edge = w_e is not None
    fp = e_slots.shape[-1]
    n_visits = int(tables.visit_slot.shape[0])
    visit_blk = jnp.take(tables.blk_ids, tables.visit_slot)
    kernel = functools.partial(
        _fused_reduce_kernel, hd=hd, h=h, bd=bd, page=page, r=r, scale=scale,
        nd=nd, ns=kv.shape[0], fuse_edge=fuse_edge,
    )
    in_specs = [
        pl.BlockSpec((1, 2, r), lambda t, vs, vp, vb: (vs[t], 0, 0)),
        pl.BlockSpec((bd, hd), lambda t, vs, vp, vb: (vb[t], 0)),
        pl.BlockSpec((page, 2 * hd), lambda t, vs, vp, vb: (vp[t], 0)),
        pl.BlockSpec((r, fp), lambda t, vs, vp, vb: (vs[t], 0)),
        pl.BlockSpec((bd, hd), lambda t, vs, vp, vb: (vb[t], 0)),
        pl.BlockSpec((bd, h), lambda t, vs, vp, vb: (vb[t], 0)),
        pl.BlockSpec((bd, h), lambda t, vs, vp, vb: (vb[t], 0)),
    ]
    inputs = [tables.visit_slot, tables.visit_page, visit_blk,
              tables.idx, q, kv, e_slots, g, lse, delta]
    if fuse_edge:
        in_specs.append(pl.BlockSpec((fp, hd), lambda t, vs, vp, vb: (0, 0)))
        inputs.append(w_e)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_visits,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((page, 2 * hd), lambda t, vs, vp, vb: (vp[t], 0)),
        scratch_shapes=[pltpu.VMEM((page, 2 * hd), jnp.float32)],
    )
    ns_pad = _cdiv(tables.num_src, page) * page
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((ns_pad, 2 * hd), q.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(*inputs)
    return out[: tables.num_src]


# ----------------------------------------------------------------------
# public op with custom VJP
# ----------------------------------------------------------------------
_INTERPRET = False


def set_interpret(flag: bool):
    """Force interpreter mode (CPU tests / virtual-device meshes)."""
    global _INTERPRET
    _INTERPRET = bool(flag)


def _host_indicator(hd, h, dtype):
    d = hd // h
    g = np.zeros((hd, h), dtype=np.float32)
    g[np.arange(hd), np.arange(hd) // d] = 1.0
    return jnp.asarray(g, dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 6))
def paged_gt_attention_flat(query, key, value, e_slots, num_heads, tables,
                            stabilize=True):
    """query [Nd, HD]; key/value [Ns, HD]; e_slots [num_slots*r, HD] in slot
    layout (PagedCSR.pad_edge_array).  Returns [Nd, HD].

    ``stabilize=False`` drops the in-kernel softmax shift (exact only while
    logits stay inside the fp32 exp range -- safe with qk-norm)."""
    out, _ = _paged_fwd_impl(query, key, value, e_slots, num_heads, tables,
                             stabilize)
    return out


def _paged_fwd_impl(query, key, value, e_slots, num_heads, tables, stabilize):
    kv = jnp.concatenate([key, value], axis=-1)
    out, lse = _fwd_call(query, kv, e_slots, tables, num_heads, _INTERPRET,
                         stabilize)
    # checkpoint_name tags make the kernel outputs policy-addressable: under
    # nn.remat(policy=save_only_these_names("paged_attn_out", "paged_attn_lse"))
    # the backward pass reuses out/lse instead of re-running the forward
    # kernel (the custom_vjp is inlined inside the remat region, so names on
    # its residuals are visible to the policy).  Identity outside remat.
    out = checkpoint_name(out, "paged_attn_out")
    lse = checkpoint_name(lse, "paged_attn_lse")
    return out, (query, kv, e_slots, out, lse, tables)


def _paged_fwd_vjp(query, key, value, e_slots, num_heads, tables, stabilize):
    out, res = _paged_fwd_impl(query, key, value, e_slots, num_heads, tables,
                               stabilize)
    return out, res


def _paged_bwd(num_heads, stabilize, res, g):
    query, kv, e_slots, out, lse, tables = res
    hd = query.shape[-1]
    g_red = _host_indicator(hd, num_heads, jnp.float32)
    delta = jnp.dot(
        out.astype(jnp.float32) * g.astype(jnp.float32), g_red,
        preferred_element_type=jnp.float32,
    )  # [Nd, H]
    gq = g.astype(query.dtype)
    dq, dkv, d_e = _bwd_call(
        query, kv, e_slots, gq, lse, delta, tables,
        num_heads, _INTERPRET, emit_dkv=not tables.fused_bwd,
    )
    if tables.fused_bwd:
        dkv_src = _fused_reduce_call(
            query, kv, e_slots, gq, lse, delta, tables, num_heads, _INTERPRET
        )
    else:
        dkv_src = _reduce_call(dkv, tables, _INTERPRET)
    d_key, d_value = dkv_src[:, :hd], dkv_src[:, hd:]
    return dq, d_key, d_value, d_e, None


paged_gt_attention_flat.defvjp(_paged_fwd_vjp, _paged_bwd)


# --- fused-edge-projection variant --------------------------------------
EDGE_LANES = 128  # raw slot features padded to one lane tile


def pad_raw_edge_features(e_raw: jnp.ndarray, lanes: int = EDGE_LANES):
    """[num_flat, F] raw slot features -> [num_flat, Fp] with a ones bias
    lane at column F and zero padding (lanes tile for the kernel DMA)."""
    f = e_raw.shape[-1]
    fp = _cdiv(f + 1, lanes) * lanes
    ones = jnp.ones(e_raw.shape[:-1] + (1,), e_raw.dtype)
    pad = jnp.zeros(e_raw.shape[:-1] + (fp - f - 1,), e_raw.dtype)
    return jnp.concatenate([e_raw, ones, pad], axis=-1)


def augment_edge_weights(kernel: jnp.ndarray, bias: jnp.ndarray, fp: int):
    """lin_edge kernel [F, HD] + bias [HD] -> [Fp, HD] matching
    pad_raw_edge_features' layout (bias row at F, zeros after)."""
    f, hd = kernel.shape
    return jnp.concatenate(
        [kernel, bias[None, :], jnp.zeros((fp - f - 1, hd), kernel.dtype)], axis=0
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 7))
def paged_gt_attention_flat_fe(query, key, value, raw_slots, w_aug,
                               num_heads, tables, stabilize=True):
    """Fused-edge-projection variant: ``raw_slots`` [num_slots*r, Fp] are the
    RAW slot-layout edge features (pad_raw_edge_features), ``w_aug`` [Fp, HD]
    the augmented lin_edge weights (augment_edge_weights).  The projected
    [num_flat, HD] edge tensor never exists in HBM: the kernels project the
    [r, Fp] raw block against the resident weights (fwd + both backward
    flavours), the backward emits raw-feature grads [num_flat, Fp] and the
    accumulated weight grad [Fp, HD] directly."""
    out, _ = _paged_fe_fwd_impl(query, key, value, raw_slots, w_aug,
                                num_heads, tables, stabilize)
    return out


def _paged_fe_fwd_impl(query, key, value, raw_slots, w_aug, num_heads,
                       tables, stabilize):
    kv = jnp.concatenate([key, value], axis=-1)
    w_c = w_aug.astype(query.dtype)
    out, lse = _fwd_call(query, kv, raw_slots, tables, num_heads, _INTERPRET,
                         stabilize, w_e=w_c)
    out = checkpoint_name(out, "paged_attn_out")
    lse = checkpoint_name(lse, "paged_attn_lse")
    return out, (query, kv, raw_slots, w_c, out, lse, tables)


def _paged_fe_fwd_vjp(query, key, value, raw_slots, w_aug, num_heads,
                      tables, stabilize):
    return _paged_fe_fwd_impl(query, key, value, raw_slots, w_aug,
                              num_heads, tables, stabilize)


def _paged_fe_bwd(num_heads, stabilize, res, g):
    query, kv, raw_slots, w_c, out, lse, tables = res
    hd = query.shape[-1]
    g_red = _host_indicator(hd, num_heads, jnp.float32)
    delta = jnp.dot(
        out.astype(jnp.float32) * g.astype(jnp.float32), g_red,
        preferred_element_type=jnp.float32,
    )
    gq = g.astype(query.dtype)
    dq, dkv, draw, dw = _bwd_call(
        query, kv, raw_slots, gq, lse, delta, tables,
        num_heads, _INTERPRET, emit_dkv=not tables.fused_bwd,
        w_e=w_c, wt_e=w_c.T,
    )
    if tables.fused_bwd:
        dkv_src = _fused_reduce_call(
            query, kv, raw_slots, gq, lse, delta, tables, num_heads,
            _INTERPRET, w_e=w_c,
        )
    else:
        dkv_src = _reduce_call(dkv, tables, _INTERPRET)
    d_key, d_value = dkv_src[:, :hd], dkv_src[:, hd:]
    return dq, d_key, d_value, draw, dw.astype(jnp.float32), None


paged_gt_attention_flat_fe.defvjp(_paged_fe_fwd_vjp, _paged_fe_bwd)


@jax.custom_vjp
def to_slot_layout(x, slot_gather, edge_slot):
    """Move a per-edge array [E, ...] (canonical dst-sorted order) into the
    kernel's slot layout [num_slots*r, ...], zero on padding positions.

    Both directions are pure gathers (repo invariant: no scatters in jitted
    programs): forward gathers through ``slot_gather`` (pad rows hit the
    appended zero row), backward gathers the cotangent through ``edge_slot``
    -- exact because slot positions are unique per edge and the kernel emits
    zero cotangents on padding slots."""
    return _slot_impl(x, slot_gather)


def _slot_impl(x, slot_gather):
    xp = jnp.concatenate([x, jnp.zeros((1,) + x.shape[1:], x.dtype)], axis=0)
    return jnp.take(xp, slot_gather, axis=0)


def _slot_fwd(x, slot_gather, edge_slot):
    return _slot_impl(x, slot_gather), edge_slot


def _slot_bwd(edge_slot, g):
    return jnp.take(g, edge_slot, axis=0), None, None


to_slot_layout.defvjp(_slot_fwd, _slot_bwd)


def paged_gt_attention(query, key, value, e_slots, tables: PagedTables,
                       stabilize: bool = True):
    """Head-structured wrapper: q [Nd, H, D]; k/v [Ns, H, D];
    e_slots [num_slots*r, H, D] (slot layout)."""
    n, h, d = query.shape
    out = paged_gt_attention_flat(
        query.reshape(n, h * d),
        key.reshape(key.shape[0], h * d),
        value.reshape(value.shape[0], h * d),
        e_slots.reshape(e_slots.shape[0], h * d),
        h,
        tables,
        stabilize,
    )
    return out.reshape(n, h, d)

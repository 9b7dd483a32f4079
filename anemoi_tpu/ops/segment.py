"""Pure-JAX sparse graph ops (the reference backend for the Pallas kernels).

These mirror the math of the reference's PyG message-passing convs
(/root/reference/models/src/anemoi/models/layers/conv.py:29-147) as XLA
segment ops.  Edges are expected **dst-sorted** (the framework invariant set
by graph post-processing), which lets every segment reduction use
``indices_are_sorted=True`` so XLA lowers to contiguous scatter-adds instead
of generic scatters.

The Pallas CSC kernel (anemoi_tpu.ops.pallas.gt_attention) is parity-tested
against :func:`graph_transformer_attention`, exactly as the reference tests
its Triton kernel against the PyG conv (models/tests/integration/triton/).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def segment_softmax(
    scores: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    indices_are_sorted: bool = True,
) -> jnp.ndarray:
    """Numerically-stable softmax over segments.

    scores: [E, ...]; segment_ids: [E] destination ids; returns [E, ...].
    Matches torch_geometric.utils.softmax semantics (empty segments yield no
    contributions; masked/padding edges should carry -inf scores upstream or
    point at a dump segment).
    """
    seg_max = jax.ops.segment_max(
        scores, segment_ids, num_segments=num_segments, indices_are_sorted=indices_are_sorted
    )
    # empty segments give -inf max; harmless because nothing gathers them
    shifted = scores - jnp.take(seg_max, segment_ids, axis=0)
    exp = jnp.exp(shifted)
    seg_sum = jax.ops.segment_sum(
        exp, segment_ids, num_segments=num_segments, indices_are_sorted=indices_are_sorted
    )
    denom = jnp.take(seg_sum, segment_ids, axis=0)
    return exp / jnp.maximum(denom, 1e-16)


def graph_transformer_attention(
    query: jnp.ndarray,
    key: jnp.ndarray,
    value: jnp.ndarray,
    edge_attr: Optional[jnp.ndarray],
    edge_index: jnp.ndarray,
    num_dst: Optional[int] = None,
    indices_are_sorted: bool = True,
) -> jnp.ndarray:
    """Sparse multi-head graph-transformer attention.

    Math of the reference's GraphTransformerConv (conv.py:84-147):
      k'_e = k[src_e] + e_e ;  v'_e = v[src_e] + e_e
      alpha_e = softmax_over_dst((q[dst_e] . k'_e) / sqrt(D))
      out_d = sum_{e: dst_e = d} alpha_e * v'_e

    query: [N_dst, H, D]; key/value: [N_src, H, D]; edge_attr: [E, H, D] or None;
    edge_index: [2, E] (src row 0, dst row 1), dst-sorted. Returns [N_dst, H, D].
    """
    if num_dst is None:
        num_dst = query.shape[0]
    src, dst = edge_index[0], edge_index[1]
    d = query.shape[-1]

    k_e = jnp.take(key, src, axis=0)
    v_e = jnp.take(value, src, axis=0)
    if edge_attr is not None:
        k_e = k_e + edge_attr
        v_e = v_e + edge_attr

    q_e = jnp.take(query, dst, axis=0)
    alpha = jnp.sum(q_e * k_e, axis=-1) / jnp.sqrt(jnp.asarray(d, dtype=query.dtype))  # [E, H]
    alpha = segment_softmax(alpha, dst, num_dst, indices_are_sorted)
    out = jax.ops.segment_sum(
        v_e * alpha[..., None], dst, num_segments=num_dst, indices_are_sorted=indices_are_sorted
    )
    return out


def graph_conv_aggregate(
    edges_new: jnp.ndarray,
    dst: jnp.ndarray,
    num_dst: int,
    indices_are_sorted: bool = True,
) -> jnp.ndarray:
    """Sum edge messages into destination nodes (GraphConv.aggregate, conv.py:78)."""
    return jax.ops.segment_sum(
        edges_new, dst, num_segments=num_dst, indices_are_sorted=indices_are_sorted
    )

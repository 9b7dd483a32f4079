"""Padded-CSR sparse graph ops: the TPU-native formulation.

Scatters are slow on TPU (serialized updates); gathers + dense masked math are
fast.  Because the framework invariant keeps edges dst-sorted with a CSR
``dst_ptr``, every destination's incoming edges can be laid out as a padded
neighbour table computed once on the host:

    edge_slots [N_dst, K]  -- edge id per slot (K = max in-degree), pad -> E
    mask       [N_dst, K]  -- slot validity

Attention then becomes gather -> dense masked softmax over K -> weighted sum:
pure gathers + VPU math, no scatter in forward OR backward (the backward of a
take over unique slot indices is a take-transpose XLA handles well).

This is the "reference-fast" backend; the Pallas kernel fuses the same
computation to avoid materialising [N, K, H, D] intermediates in HBM.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class PaddedCSR:
    """Host-precomputed padded neighbour tables for one dst-sorted edge set."""

    edge_slots: np.ndarray  # [N_dst, K] int32, pad = num_edges (sentinel row)
    src_slots: np.ndarray  # [N_dst, K] int32 source node per slot, pad = 0
    mask: np.ndarray  # [N_dst, K] bool
    num_edges: int
    num_src: int

    @property
    def num_dst(self) -> int:
        return int(self.edge_slots.shape[0])

    @property
    def max_degree(self) -> int:
        return int(self.edge_slots.shape[1])

    @classmethod
    def from_edge_index(
        cls,
        edge_index: np.ndarray,
        dst_ptr: np.ndarray,
        num_src: int,
        bucket_multiple: int = 8,
    ) -> "PaddedCSR":
        """Build tables from dst-sorted edges + CSR pointer.

        K is the max in-degree rounded up to ``bucket_multiple`` (lane-friendly).
        """
        num_dst = len(dst_ptr) - 1
        num_edges = int(edge_index.shape[1])
        degrees = np.diff(dst_ptr)
        k = int(max(1, degrees.max()))
        k = ((k + bucket_multiple - 1) // bucket_multiple) * bucket_multiple

        edge_slots = np.full((num_dst, k), num_edges, dtype=np.int32)
        src_slots = np.zeros((num_dst, k), dtype=np.int32)
        mask = np.zeros((num_dst, k), dtype=bool)
        # vectorised fill: position of each edge within its dst segment
        dst = edge_index[1]
        within = np.arange(num_edges) - dst_ptr[dst]
        edge_slots[dst, within] = np.arange(num_edges, dtype=np.int32)
        src_slots[dst, within] = edge_index[0]
        mask[dst, within] = True
        return cls(
            edge_slots=edge_slots,
            src_slots=src_slots,
            mask=mask,
            num_edges=num_edges,
            num_src=num_src,
        )


def padded_gt_attention(
    query: jnp.ndarray,  # [N_dst, H, D]
    key: jnp.ndarray,  # [N_src, H, D]
    value: jnp.ndarray,  # [N_src, H, D]
    edge_attr: Optional[jnp.ndarray],  # [E, H, D]
    csr: PaddedCSR,
    src_slots: Optional[jnp.ndarray] = None,
    edge_slots: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Graph-transformer attention over padded neighbour tables.

    Same math as ops.segment.graph_transformer_attention (reference conv.py:84)
    but formulated scatter-free.  The table arrays may be passed explicitly as
    jnp arrays (e.g. pre-device-put shards); otherwise taken from ``csr``.
    """
    src_slots = jnp.asarray(csr.src_slots) if src_slots is None else src_slots
    mask = jnp.asarray(csr.mask) if mask is None else mask
    d = query.shape[-1]

    k_nbr = jnp.take(key, src_slots.reshape(-1), axis=0).reshape(
        src_slots.shape + key.shape[1:]
    )  # [N, K, H, D]
    v_nbr = jnp.take(value, src_slots.reshape(-1), axis=0).reshape(
        src_slots.shape + value.shape[1:]
    )
    if edge_attr is not None:
        edge_slots = jnp.asarray(csr.edge_slots) if edge_slots is None else edge_slots
        e_pad = jnp.concatenate(
            [edge_attr, jnp.zeros((1,) + edge_attr.shape[1:], edge_attr.dtype)], axis=0
        )
        e_nbr = jnp.take(e_pad, edge_slots.reshape(-1), axis=0).reshape(
            edge_slots.shape + edge_attr.shape[1:]
        )
        k_nbr = k_nbr + e_nbr
        v_nbr = v_nbr + e_nbr

    logits = jnp.einsum("nhd,nkhd->nkh", query, k_nbr) / jnp.sqrt(
        jnp.asarray(d, dtype=query.dtype)
    )
    logits = jnp.where(mask[..., None], logits, -jnp.inf)
    logits_max = jnp.max(logits, axis=1, keepdims=True)
    # all-padded rows produce -inf max; zero them so exp() stays finite
    logits_max = jnp.where(jnp.isfinite(logits_max), logits_max, 0.0)
    alpha = jnp.exp(logits - logits_max)
    alpha = jnp.where(mask[..., None], alpha, 0.0)
    denom = jnp.sum(alpha, axis=1, keepdims=True)
    alpha = alpha / jnp.maximum(denom, 1e-16)
    return jnp.einsum("nkh,nkhd->nhd", alpha, v_nbr)


def padded_graph_conv_aggregate(
    messages: jnp.ndarray,  # [E, C] per-edge messages (dst-sorted order)
    csr: PaddedCSR,
    edge_slots: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Scatter-free segment sum of edge messages into destinations."""
    edge_slots = jnp.asarray(csr.edge_slots) if edge_slots is None else edge_slots
    mask = jnp.asarray(csr.mask) if mask is None else mask
    m_pad = jnp.concatenate(
        [messages, jnp.zeros((1,) + messages.shape[1:], messages.dtype)], axis=0
    )
    gathered = jnp.take(m_pad, edge_slots.reshape(-1), axis=0).reshape(
        edge_slots.shape + messages.shape[1:]
    )
    gathered = jnp.where(mask[..., None], gathered, 0.0)
    return jnp.sum(gathered, axis=1)

"""Pallas fused graph-transformer attention (round-2 work in progress).

Round-1 findings on the axon toolchain (see docs/design.md §6 and the
project memory):

- Mosaic here does NOT support in-kernel dynamic gathers (`jnp.take` fails
  with "Shape mismatch in input, indices and output").
- One-hot `dot_general` gathers compile and are numerically fine for
  O(1)-magnitude data, but cost BN*W*HD MACs per block -- only worthwhile
  inside a fused block where the MXU is otherwise idle.
- A paged-attention-style per-row DMA gather kernel (PrefetchScalarGridSpec +
  double-buffered `make_async_copy` per row) compiles but deadlocks at
  runtime on this toolchain; needs interpret-mode debugging on real hardware
  time we did not have in round 1.

Until the fused kernel lands, the "pallas" backend falls back to the
scatter-free padded XLA path (ops/padded.py), which is the performance
baseline it must beat.
"""

from __future__ import annotations

from anemoi_tpu.ops.padded import padded_gt_attention


def gt_attention_pallas(query, key, value, edge_attr, tables):
    """Placeholder dispatch: the fused kernel is round-2 work; use the
    scatter-free padded path so the 'pallas' backend stays functional."""
    return padded_gt_attention(query, key, value, edge_attr, tables)

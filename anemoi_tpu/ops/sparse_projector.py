"""Sparse CSR-style projection.

Equivalent of /root/reference/models/src/anemoi/models/layers/sparse_projector.py:13
(SparseProjector): apply a sparse projection matrix to node fields.  The
reference chunks a torch sparse matmul; here the matrix is held as
dst-sorted COO triplets and the product is a gather + dst-sorted
segment-sum — the same scatter-pattern-free layout every sparse op in this
framework uses (segments are sorted, so XLA lowers to a contiguous
reduction, not random scatter).

Used by TruncatedConnection (models/layers/residual.py), the multiscale
loss wrapper (training/losses/multiscale.py), and any graph-provider
projection path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class SparseProjector:
    """Project [..., rows, V] onto [..., num_dst, V] through sparse weights.

    Parameters
    ----------
    edge_index : [2, E] (src, dst) with dst sorted ascending
    weights : [E] or [E, 1] matrix entries
    num_dst : number of output rows
    row_normalize : divide each output row by its total incoming weight
    """

    def __init__(self, edge_index, weights, num_dst: int, row_normalize: bool = True):
        ei = np.asarray(edge_index)
        w = np.asarray(weights, dtype=np.float32).reshape(-1)
        assert ei.shape[0] == 2 and ei.shape[1] == w.shape[0], (ei.shape, w.shape)
        assert np.all(np.diff(ei[1]) >= 0), "SparseProjector needs dst-sorted edges"
        if row_normalize:
            sums = np.zeros(num_dst, dtype=np.float64)
            np.add.at(sums, ei[1], w)
            w = (w / np.maximum(sums[ei[1]], 1e-12)).astype(np.float32)
        self.src = jnp.asarray(ei[0])
        self.dst = jnp.asarray(ei[1])
        self.w = jnp.asarray(w)
        self.num_dst = int(num_dst)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        gathered = jnp.take(x, self.src, axis=-2) * self.w[:, None]
        moved = jnp.moveaxis(gathered, -2, 0)
        out = jax.ops.segment_sum(
            moved, self.dst, num_segments=self.num_dst, indices_are_sorted=True
        )
        return jnp.moveaxis(out, 0, -2)

    def as_dense(self) -> np.ndarray:
        """Materialise the [num_dst, rows] matrix (tests / inspection only)."""
        n_src = int(np.asarray(self.src).max()) + 1
        m = np.zeros((self.num_dst, n_src), np.float32)
        np.add.at(m, (np.asarray(self.dst), np.asarray(self.src)), np.asarray(self.w))
        return m

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

import functools

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
        # Transpose table for the custom VJP: the x-cotangent is P^T g, i.e.
        # x_ct[src] += w * g[dst].  Pre-sorting the triplets by src makes that
        # another sorted-segment reduction, keeping the repo's "no scatters in
        # jitted programs" invariant for the backward pass too.
        order = np.argsort(ei[0], kind="stable")
        self.t_src = jnp.asarray(ei[0][order])  # sorted segment ids
        self.t_dst = jnp.asarray(ei[1][order])  # gather rows from g
        self.t_w = jnp.asarray(w[order])

    def _project(self, x: jnp.ndarray) -> jnp.ndarray:
        gathered = jnp.take(x, self.src, axis=-2) * self.w[:, None]
        moved = jnp.moveaxis(gathered, -2, 0)
        out = jax.ops.segment_sum(
            moved, self.dst, num_segments=self.num_dst, indices_are_sorted=True
        )
        return jnp.moveaxis(out, 0, -2)

    def _project_t(self, g: jnp.ndarray, n_src: int) -> jnp.ndarray:
        gathered = jnp.take(g, self.t_dst, axis=-2) * self.t_w[:, None]
        moved = jnp.moveaxis(gathered, -2, 0)
        out = jax.ops.segment_sum(
            moved, self.t_src, num_segments=n_src, indices_are_sorted=True
        )
        return jnp.moveaxis(out, 0, -2)

    @functools.lru_cache(maxsize=None)
    def _apply_for(self, n_src: int):
        """custom-VJP projection specialised to x with ``n_src`` rows."""

        @jax.custom_vjp
        def apply(x):
            return self._project(x)

        def fwd(x):
            return self._project(x), None

        def bwd(_, g):
            return (self._project_t(g, n_src),)

        apply.defvjp(fwd, bwd)
        return apply

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self._apply_for(int(x.shape[-2]))(x)

    # -- provider-style constructors (ref graph_provider.py:464-614,
    #    ProjectionGraphProvider: build from graph edges or an .npz file) ----
    @classmethod
    def from_graph(
        cls,
        graph,
        edges_name,
        edge_weight_attribute: str | None = None,
        src_node_weight_attribute: str | None = None,
        row_normalize: bool = True,
    ) -> "SparseProjector":
        """Build from a (src, dst) sub-graph of a ``Graph``: weights from an
        edge attribute, a source-node attribute, or 1 (ref :534-571)."""
        src_name, dst_name = edges_name[0], edges_name[-1]
        sub = graph[(src_name, dst_name)]
        ei = np.asarray(sub.edge_index)
        if edge_weight_attribute is not None:
            w = np.asarray(sub.attributes[edge_weight_attribute]).reshape(-1)
        elif src_node_weight_attribute is not None:
            node_w = np.asarray(
                graph[src_name].attributes[src_node_weight_attribute]
            ).reshape(-1)
            w = node_w[ei[0]]
        else:
            w = np.ones(ei.shape[1], dtype=np.float32)
        order = np.argsort(ei[1], kind="stable")
        ei = ei[:, order]
        w = w[order]
        return cls(ei, w, num_dst=graph[dst_name].num_nodes, row_normalize=row_normalize)

    @classmethod
    def from_file(cls, file_path, row_normalize: bool = True) -> "SparseProjector":
        """Load a projection from an .npz with ``src``/``dst``/``weights``
        (+``num_dst``) or scipy-CSR-style ``indptr``/``indices``/``data``
        arrays (ref :530-532 _build_from_file)."""
        z = np.load(file_path)
        if "indptr" in z:
            indptr, indices, data = z["indptr"], z["indices"], z["data"]
            num_dst = len(indptr) - 1
            dst = np.repeat(np.arange(num_dst), np.diff(indptr))
            ei = np.stack([indices.astype(np.int64), dst.astype(np.int64)])
            w = data
        else:
            ei = np.stack([z["src"].astype(np.int64), z["dst"].astype(np.int64)])
            w = z["weights"]
            num_dst = int(z["num_dst"]) if "num_dst" in z else int(ei[1].max()) + 1
            order = np.argsort(ei[1], kind="stable")
            ei = ei[:, order]
            w = w[order]
        return cls(ei, w, num_dst=num_dst, row_normalize=row_normalize)

    def as_dense(self) -> np.ndarray:
        """Materialise the [num_dst, rows] matrix (tests / inspection only)."""
        n_src = int(np.asarray(self.src).max()) + 1
        m = np.zeros((self.num_dst, n_src), np.float32)
        np.add.at(m, (np.asarray(self.dst), np.asarray(self.src)), np.asarray(self.w))
        return m

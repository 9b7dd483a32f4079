"""Ulysses-style head<->sequence all_to_all sequence parallelism.

TPU-native equivalent of the reference's "heads" shard strategy
(/root/reference/models/src/anemoi/models/distributed/graph.py:399-436
all_to_all_transpose + layers/attention.py:208-237; DeepSpeed-Ulysses,
Jacobs et al. 2023): q/k/v are computed on the local sequence shard, one
`lax.all_to_all` reshards from sequence-sharded to head-sharded (every device
sees the FULL sequence for its head subset), dense attention runs locally,
and the reverse all_to_all restores sequence sharding.  AD differentiates the
collectives automatically (all_to_all is its own transpose).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from anemoi_tpu.models.layers.attention import _window_attention


def seq_to_heads(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """[n_loc, H, D] sequence-sharded -> [S*n_loc, H/S, D] head-sharded."""
    return jax.lax.all_to_all(x, axis_name, split_axis=1, concat_axis=0, tiled=True)


def heads_to_seq(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """[S*n_loc, H/S, D] head-sharded -> [n_loc, H, D] sequence-sharded."""
    return jax.lax.all_to_all(x, axis_name, split_axis=0, concat_axis=1, tiled=True)


def ulysses_attention(
    q_local: jnp.ndarray,  # [n_loc, H, D] (this shard's sequence slice)
    k_local: jnp.ndarray,
    v_local: jnp.ndarray,
    window_size: Optional[int] = None,
    softcap: Optional[float] = None,
    axis_name: str = "model",
) -> jnp.ndarray:
    """Sequence-parallel dense (sliding-window) attention.

    Runs inside shard_map over ``axis_name``; num_heads must be divisible by
    the axis size.  Returns the sequence-sharded output [n_loc, H, D].
    """
    q = seq_to_heads(q_local, axis_name)  # [N_full, H/S, D]
    k = seq_to_heads(k_local, axis_name)
    v = seq_to_heads(v_local, axis_name)
    out = _window_attention(q[None], k[None], v[None], window_size, softcap)[0]
    return heads_to_seq(out, axis_name)


def ulysses_mhsa(
    query: jnp.ndarray,  # [B, N, H, D], node axis GSPMD-sharded over 'model'
    key: jnp.ndarray,
    value: jnp.ndarray,
    window_size: Optional[int] = None,
    softcap: Optional[float] = None,
    alibi_slopes: Optional[jnp.ndarray] = None,  # [H]
    valid_len: Optional[int] = None,  # true node count before S-padding
    axis_name: str = "model",
) -> jnp.ndarray:
    """Model-facing batched Ulysses MHSA: wraps a partial-manual shard_map
    over ``axis_name`` (other mesh axes stay automatic/GSPMD) around the
    head<->sequence all_to_all + dense windowed attention.  Equivalent of the
    reference's TransformerProcessor attention path
    (/root/reference/models/src/anemoi/models/layers/attention.py:208-237)."""
    from jax.sharding import PartitionSpec as P

    node_spec = P(None, axis_name, None, None)

    def kernel(q, k, v):
        # [B, n_loc, H, D] -> [B, N, H/S, D]
        qh = jax.lax.all_to_all(q, axis_name, split_axis=2, concat_axis=1, tiled=True)
        kh = jax.lax.all_to_all(k, axis_name, split_axis=2, concat_axis=1, tiled=True)
        vh = jax.lax.all_to_all(v, axis_name, split_axis=2, concat_axis=1, tiled=True)
        slopes = None
        if alibi_slopes is not None:
            h_loc = qh.shape[2]
            idx = jax.lax.axis_index(axis_name)
            slopes = jax.lax.dynamic_slice_in_dim(
                alibi_slopes, idx * h_loc, h_loc, axis=0
            )
        out = _window_attention(qh, kh, vh, window_size, softcap, slopes,
                                valid_len=valid_len)
        return jax.lax.all_to_all(out, axis_name, split_axis=1, concat_axis=2, tiled=True)

    return jax.shard_map(
        kernel,
        in_specs=(node_spec, node_spec, node_spec),
        out_specs=node_spec,
        axis_names={axis_name},
        check_vma=False,
    )(query, key, value)


def ulysses_gt_attention(
    query: jnp.ndarray,  # [B, N, HD] flat, node axis GSPMD-sharded over 'model'
    key: jnp.ndarray,
    value: jnp.ndarray,
    edges: Optional[jnp.ndarray],  # [E, HD] global edge projections
    tables,  # global PaddedTables (replicated on every shard)
    num_heads: int,
    valid_len: Optional[int] = None,  # true node count before S-padding
    axis_name: str = "model",
) -> jnp.ndarray:
    """"heads" shard strategy for SPARSE graph-transformer attention: the
    head<->sequence all_to_all gives every shard the FULL node set for its
    head subset, the scatter-free padded attention runs on global tables with
    H/S heads, and the reverse all_to_all restores node sharding (ref
    layers/block.py:689-727 shard_qkve_heads for the GraphTransformer)."""
    from jax.sharding import PartitionSpec as P

    from anemoi_tpu.ops.padded import padded_gt_attention_flat

    node_spec = P(None, axis_name, None)

    def kernel(q, k, v, e, tbl):
        B, n_loc, hd = q.shape
        d = hd // num_heads

        def to_heads(x):
            x4 = x.reshape(B, n_loc, num_heads, d)
            x4 = jax.lax.all_to_all(
                x4, axis_name, split_axis=2, concat_axis=1, tiled=True
            )  # [B, N, h_loc, d]
            return x4.reshape(B, x4.shape[1], -1)

        qf, kf, vf = to_heads(q), to_heads(k), to_heads(v)
        h_loc = qf.shape[-1] // d
        ef = None
        if e is not None:
            idx = jax.lax.axis_index(axis_name)
            e4 = e.reshape(-1, num_heads, d)
            ef = jax.lax.dynamic_slice_in_dim(
                e4, idx * h_loc, h_loc, axis=1
            ).reshape(-1, h_loc * d)

        # the padded tables are sized for the TRUE node count; slice off the
        # sequence padding before attention, pad the output back after
        n_full = qf.shape[1]
        n_true = n_full if valid_len is None else valid_len
        qf, kf, vf = qf[:, :n_true], kf[:, :n_true], vf[:, :n_true]

        def one(q1, k1, v1):
            return padded_gt_attention_flat(q1, k1, v1, ef, h_loc, tbl)

        out = jax.vmap(one)(qf, kf, vf)  # [B, N_true, h_loc*d]
        if n_true < n_full:
            out = jnp.pad(out, ((0, 0), (0, n_full - n_true), (0, 0)))
        out4 = out.reshape(B, out.shape[1], h_loc, d)
        back = jax.lax.all_to_all(
            out4, axis_name, split_axis=1, concat_axis=2, tiled=True
        )  # [B, n_loc, H, d]
        return back.reshape(B, n_loc, hd)

    return jax.shard_map(
        kernel,
        in_specs=(node_spec, node_spec, node_spec, P(), P()),
        out_specs=node_spec,
        axis_names={axis_name},
        check_vma=False,
    )(query, key, value, edges, tables)

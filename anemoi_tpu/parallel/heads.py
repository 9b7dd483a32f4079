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

"""Random source/noise fields that stay consistent under grid sharding.

TPU-native counterpart of
/root/reference/models/src/anemoi/models/transport/random_fields.py:16-62.
The reference's problem is NCCL-specific: model-parallel ranks share a seed, so
per-rank ``randn`` would give every rank identical noise; it therefore draws
the full field and scatters shards.  The JAX answers:

- **GSPMD** (sharding constraints): ``jax.random.normal`` with the partitionable
  threefry implementation produces identical values regardless of sharding --
  just constrain the output; XLA gives each device its distinct slice.
- **shard_map** (explicit-collective paths): draw the FULL field from the
  shared key inside each shard and slice this shard's grid rows -- bitwise the
  same field as single-device execution, no communication at all (noise is
  cheaper to recompute than to send over ICI).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def randn_grid_sharded(
    key: jax.Array,
    shape: Sequence[int],
    dtype=jnp.float32,
    *,
    shard_sizes: Optional[Tuple[int, ...]] = None,
    shard_index=None,
    shard_dim: int = -2,
    out_sharding=None,
):
    """Gaussian field over the FULL grid, returning this shard's rows.

    Without ``shard_sizes``: the plain draw (optionally GSPMD-constrained with
    ``out_sharding``).  With ``shard_sizes`` + ``shard_index`` (shard_map
    path): draws the full field and slices shard ``shard_index``; equal shard
    sizes are required so the slice is jit-static.
    """
    if shard_sizes is None:
        noise = jax.random.normal(key, tuple(shape), dtype)
        if out_sharding is not None:
            noise = jax.lax.with_sharding_constraint(noise, out_sharding)
        return noise

    ndim = len(shape)
    if not -ndim <= shard_dim < ndim:
        raise ValueError(
            f"Cannot shard random tensor of rank {ndim} along dim {shard_dim}."
        )
    shard_dim = shard_dim % ndim
    sizes = tuple(int(s) for s in shard_sizes)
    if len(set(sizes)) != 1:
        raise ValueError(
            "shard_map random fields need equal shard sizes; got " f"{sizes}"
        )
    local = sizes[0]
    full_shape = list(shape)
    full_shape[shard_dim] = sum(sizes)
    noise = jax.random.normal(key, tuple(full_shape), dtype)
    start = jnp.asarray(shard_index, jnp.int32) * local
    return jax.lax.dynamic_slice_in_dim(noise, start, local, axis=shard_dim)


def randn_like_grid_sharded(key: jax.Array, x: jnp.ndarray, **kwargs):
    """``randn_grid_sharded`` with shape/dtype taken from ``x``
    (ref random_fields.py:47-62)."""
    return randn_grid_sharded(key, x.shape, x.dtype, **kwargs)

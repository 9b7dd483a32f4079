"""Normalization layers (flax.linen).

Equivalents of /root/reference/models/src/anemoi/models/layers/normalization.py:
- LayerNorm: fp32 statistics with output cast back to the input dtype
  (AutocastLayerNorm behaviour, :19) -- on TPU this keeps the reduction in
  fp32 while activations stay bf16.
- ConditionalLayerNorm (:34): affine parameters predicted from a conditioning
  vector (noise/diffusion conditioning), zero-initialised so it starts as a
  plain LayerNorm.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


class LayerNorm(nn.Module):
    """LayerNorm with fp32 statistics, cast back to input dtype."""

    epsilon: float = 1e-5
    use_scale: bool = True
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        del cond  # plain LayerNorm ignores conditioning
        out = nn.LayerNorm(
            epsilon=self.epsilon,
            use_scale=self.use_scale,
            use_bias=self.use_bias,
            dtype=jnp.float32,
            name="ln",
        )(x)
        return out.astype(x.dtype)


class QKNorm(nn.Module):
    """Query/key normalisation kernel over the per-head dim.

    ``kind='layernorm'`` matches the reference's default QueryNorm/KeyNorm
    layer kernels (AutocastLayerNorm(bias=False), ref layers/utils.py:107-120
    + normalization.py:19) -- required for checkpoint-port parity;
    ``kind='rmsnorm'`` is the cheaper variant (no mean subtraction)."""

    kind: str = "layernorm"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.kind == "rmsnorm":
            return RMSNorm(name="rms")(x)
        out = nn.LayerNorm(
            epsilon=1e-5, use_bias=False, dtype=jnp.float32, name="ln"
        )(x)
        return out.astype(x.dtype)


class ConditionalLayerNorm(nn.Module):
    """x_norm = (1 + scale(cond)) * LN(x) + bias(cond), zero-init (ref :34-96)."""

    epsilon: float = 1e-5
    autocast: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray) -> jnp.ndarray:
        normed = nn.LayerNorm(
            epsilon=self.epsilon, use_scale=False, use_bias=False, dtype=jnp.float32, name="ln"
        )(x)
        scale = nn.Dense(
            x.shape[-1], kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            name="scale",
        )(cond)
        bias = nn.Dense(
            x.shape[-1], kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            name="bias",
        )(cond)
        out = normed * (scale + 1.0) + bias
        return out.astype(x.dtype) if self.autocast else out


class RMSNorm(nn.Module):
    """RMS norm for qk-normalisation (layer_kernels.QueryNorm/KeyNorm equivalent)."""

    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out = nn.RMSNorm(epsilon=self.epsilon, dtype=jnp.float32, name="rms")(x)
        return out.astype(x.dtype)

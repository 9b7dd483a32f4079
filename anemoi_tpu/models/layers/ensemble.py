"""Ensemble noise injection (flax.linen).

Equivalents of /root/reference/models/src/anemoi/models/layers/ensemble.py:
- NoiseConditioning (:108): draw per-member Gaussian noise on the hidden mesh,
  pass it through an MLP, and return it as the conditioning vector for the
  processor's ConditionalLayerNorms.
- NoiseInjector (:224): same noise, concatenated to the latent channels and
  projected back (no conditioning returned).
- NoOpNoiseInjector (:84): deterministic passthrough.

Noise is drawn from the flax 'noise' RNG collection so ensemble members are
reproducible from the training step's folded key.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from anemoi_tpu.models.layers.mlp import MLP
from anemoi_tpu.utils.registry import Registry

noise_injector_registry = Registry("noise injector")


@noise_injector_registry.register("NoOpNoiseInjector")
class NoOpNoiseInjector(nn.Module):
    noise_std: float = 1.0
    noise_channels_dim: int = 4
    noise_mlp_hidden_dim: int = 32

    @nn.compact
    def __call__(self, x_latent: jnp.ndarray, **_) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        return x_latent, None


@noise_injector_registry.register("NoiseConditioning")
class NoiseConditioning(nn.Module):
    """Noise -> MLP -> conditioning vector for ConditionalLayerNorm."""

    noise_std: float = 1.0
    noise_channels_dim: int = 4
    noise_mlp_hidden_dim: int = 32

    @nn.compact
    def __call__(self, x_latent: jnp.ndarray, **_) -> Tuple[jnp.ndarray, jnp.ndarray]:
        # x_latent: [(B*M), N_hidden, C]; one independent noise field per member
        key = self.make_rng("noise")
        noise = (
            jax.random.normal(
                key, x_latent.shape[:2] + (self.noise_channels_dim,), dtype=jnp.float32
            )
            * self.noise_std
        )
        cond = MLP(
            hidden_dim=self.noise_mlp_hidden_dim,
            out_features=self.noise_channels_dim,
            layer_norm=True,
            name="noise_mlp",
        )(noise.astype(x_latent.dtype))
        return x_latent, cond


@noise_injector_registry.register("NoiseInjector")
class NoiseInjector(nn.Module):
    """Noise concatenated into the latent and projected back (ref :224)."""

    num_channels: int = 0  # latent width; set by the model
    noise_std: float = 1.0
    noise_channels_dim: int = 4
    noise_mlp_hidden_dim: int = 32

    @nn.compact
    def __call__(self, x_latent: jnp.ndarray, **_) -> Tuple[jnp.ndarray, None]:
        key = self.make_rng("noise")
        noise = (
            jax.random.normal(
                key, x_latent.shape[:2] + (self.noise_channels_dim,), dtype=jnp.float32
            )
            * self.noise_std
        )
        noise = MLP(
            hidden_dim=self.noise_mlp_hidden_dim,
            out_features=self.noise_channels_dim,
            layer_norm=True,
            name="noise_mlp",
        )(noise.astype(x_latent.dtype))
        out_channels = self.num_channels or x_latent.shape[-1]
        x_latent = nn.Dense(out_channels, name="projection")(
            jnp.concatenate([x_latent, noise], axis=-1)
        )
        return x_latent, None


def build_noise_injector(config: Optional[dict], num_channels: int) -> nn.Module:
    cfg = dict(config or {"name": "NoiseConditioning"})
    name = cfg.pop("name", "NoiseConditioning")
    if name == "NoiseInjector":
        cfg.setdefault("num_channels", num_channels)
    return noise_injector_registry.get(name)(**cfg)

"""Feed-forward layers (flax.linen).

Equivalent of /root/reference/models/src/anemoi/models/layers/mlp.py:97-180
(MLP with optional gated-GLU hidden layers and trailing LayerNorm).
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp

from anemoi_tpu.models.layers.normalization import LayerNorm

ACTIVATIONS = {
    # exact (erf) gelu: torch.nn.GELU's default, which reference checkpoints
    # are trained with -- flax's nn.gelu defaults to the tanh approximation,
    # which would break weight-port parity at ~1e-3 per layer
    "gelu": lambda x: nn.gelu(x, approximate=False),
    "gelu_tanh": nn.gelu,
    "relu": nn.relu,
    "silu": nn.silu,
    "swish": nn.silu,
    "tanh": jnp.tanh,
    "identity": lambda x: x,
}

GATING = {
    "glu": nn.sigmoid,
    "swiglu": nn.silu,
    "geglu": nn.gelu,
    "reglu": nn.relu,
}


def get_activation(name: str) -> Callable:
    if name not in ACTIVATIONS:
        raise ValueError(f"Unknown activation '{name}'. Known: {sorted(ACTIVATIONS)}")
    return ACTIVATIONS[name]


def compute_mlp_hidden_dim(dim: int, ratio: float) -> int:
    return int(dim * ratio)


class FeedForwardLayer(nn.Module):
    """One hidden layer: Linear+activation, or a gated GLU variant."""

    out_features: int
    activation: str = "gelu"
    implementation: str = "mlp"  # mlp | glu | swiglu | geglu | reglu
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # tagged so remat_policy=save_attention_mlp can save the [N, ratio*C]
        # hidden activation (the biggest matmul input the backward replays)
        from jax.ad_checkpoint import checkpoint_name

        if self.implementation == "mlp":
            x = nn.Dense(self.out_features, dtype=self.dtype, name="linear")(x)
            return checkpoint_name(
                get_activation(self.activation)(x), "mlp_hidden"
            )
        if self.implementation not in GATING:
            raise ValueError(f"Unknown mlp implementation '{self.implementation}'")
        gate = nn.Dense(self.out_features, dtype=self.dtype, name="gate_proj")(x)
        value = nn.Dense(self.out_features, dtype=self.dtype, name="value_proj")(x)
        return checkpoint_name(
            GATING[self.implementation](gate) * value, "mlp_hidden"
        )


class MLP(nn.Module):
    """Multi-layer perceptron: [in -> hidden (xN extra) -> out] with optional
    final activation and trailing LayerNorm (ref mlp.py:97)."""

    hidden_dim: int
    out_features: int
    n_extra_layers: int = 0
    activation: str = "gelu"
    implementation: str = "mlp"
    final_activation: bool = False
    layer_norm: bool = True
    zero_init_output: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = FeedForwardLayer(
            self.hidden_dim, self.activation, self.implementation, self.dtype, name="ffn_in"
        )(x)
        for i in range(self.n_extra_layers):
            x = FeedForwardLayer(
                self.hidden_dim, self.activation, self.implementation, self.dtype, name=f"ffn_{i}"
            )(x)
        out_init = (
            nn.initializers.zeros if self.zero_init_output else nn.initializers.lecun_normal()
        )
        x = nn.Dense(
            self.out_features, dtype=self.dtype, kernel_init=out_init, name="linear_out"
        )(x)
        if self.final_activation:
            x = get_activation(self.activation)(x)
        if self.layer_norm:
            x = LayerNorm(dtype=self.dtype, name="norm")(x)
        return x

"""Hidden-mesh processors (flax.linen).

Equivalents of /root/reference/models/src/anemoi/models/layers/processor.py:
- GraphTransformerProcessor (:458)
- GNNProcessor (:319)
- PointWiseMLPProcessor (:150)

TPU-first notes: layers are applied through an optional `nn.remat`
(gradient checkpointing; replaces the reference's CheckpointWrapper), and the
rollout-time memory policy composes with `jax.checkpoint` in the train step.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from anemoi_tpu.models.layers.graph_blocks import (
    GraphConvProcessorBlock,
    GraphTransformerProcessorBlock,
    PointWiseMLPBlock,
)
from anemoi_tpu.models.layers.mapper import TrainableEdgeFeatures
from anemoi_tpu.models.layers.mlp import compute_mlp_hidden_dim


class GraphTransformerProcessor(nn.Module):
    """Stack of graph-transformer blocks over the hidden mesh."""

    num_layers: int
    num_channels: int
    num_heads: int
    mlp_hidden_ratio: float = 4.0
    attn_channels: Optional[int] = None
    qk_norm: bool = False
    edge_trainable_size: int = 0
    edge_pre_mlp: bool = False
    mlp_implementation: str = "mlp"
    conditional: bool = False
    gradient_checkpointing: bool = True
    backend: str = "segment"

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [B, N, C]
        edge_attr: jnp.ndarray,
        edge_index: jnp.ndarray,
        cond: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        edge_attr = TrainableEdgeFeatures(self.edge_trainable_size, name="trainable_edges")(
            edge_attr
        )
        block_cls = GraphTransformerProcessorBlock
        if self.gradient_checkpointing:
            block_cls = nn.remat(block_cls, static_argnums=())
        for i in range(self.num_layers):
            x, edge_attr = block_cls(
                num_heads=self.num_heads,
                hidden_dim=compute_mlp_hidden_dim(self.num_channels, self.mlp_hidden_ratio),
                out_channels=self.num_channels,
                attn_channels=self.attn_channels,
                qk_norm=self.qk_norm,
                edge_pre_mlp=self.edge_pre_mlp,
                mlp_implementation=self.mlp_implementation,
                conditional=self.conditional,
                backend=self.backend,
                name=f"blocks_{i}",
            )(x, edge_attr, edge_index, cond)
        return x


class GNNProcessor(nn.Module):
    """Stack of GNN conv blocks; first layer embeds raw edge attributes, the
    updated edge features thread through subsequent layers (ref :319-458)."""

    num_layers: int
    num_channels: int
    mlp_extra_layers: int = 0
    mlp_hidden_ratio: float = 1.0
    edge_trainable_size: int = 0
    mlp_implementation: str = "mlp"
    gradient_checkpointing: bool = True

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        edge_attr: jnp.ndarray,
        edge_index: jnp.ndarray,
        cond: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        edge_attr = TrainableEdgeFeatures(self.edge_trainable_size, name="trainable_edges")(
            edge_attr
        )
        block_cls = GraphConvProcessorBlock
        if self.gradient_checkpointing:
            block_cls = nn.remat(block_cls, static_argnums=())
        for i in range(self.num_layers):
            x, edge_attr = block_cls(
                out_channels=self.num_channels,
                mlp_extra_layers=self.mlp_extra_layers,
                mlp_hidden_ratio=self.mlp_hidden_ratio,
                edge_dim=edge_attr.shape[-1] if i == 0 else None,
                mlp_implementation=self.mlp_implementation,
                name=f"blocks_{i}",
            )(x, edge_attr, edge_index, cond)
        return x


class PointWiseMLPProcessor(nn.Module):
    """Stack of point-wise MLP blocks; no message passing (ref :150-204)."""

    num_layers: int
    num_channels: int
    mlp_hidden_ratio: float = 1.0
    activation: str = "gelu"
    gradient_checkpointing: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        edge_attr: Optional[jnp.ndarray] = None,
        edge_index: Optional[jnp.ndarray] = None,
        cond: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        for i in range(self.num_layers):
            x = PointWiseMLPBlock(
                num_channels=self.num_channels,
                hidden_dim=compute_mlp_hidden_dim(self.num_channels, self.mlp_hidden_ratio),
                activation=self.activation,
                name=f"blocks_{i}",
            )(x)
        return x

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

from anemoi_tpu.models.layers.remat import (  # noqa: F401  (re-exported)
    ATTN_SAVE_NAMES as _ATTN_SAVE_NAMES,
    remat as _remat,
    resolve_remat_policy,
)


class GraphTransformerProcessor(nn.Module):
    """Stack of graph-transformer blocks over the hidden mesh.

    ``scan_layers`` (default True) runs the stack as `nn.scan` over stacked
    per-layer parameters: the XLA program contains ONE block regardless of
    depth, which keeps compile time flat in num_layers (the reference's
    16-layer default would otherwise unroll 16 copies)."""

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
    # full | save_attention | save_attention_mlp | dots (resolve_remat_policy);
    # keeps the attention kernels' out/lse (measured: o160 896->680 ms,
    # n320 1207->1046 ms vs full remat) at ~out+lse per layer extra HBM
    remat_policy: Optional[str] = "save_attention"
    scan_layers: bool = True
    # blocks per scan iteration: the scan body contains `scan_unroll`
    # distinct blocks and the loop runs num_layers/scan_unroll times --
    # a middle ground between full scan (smallest program, per-iteration
    # param dynamic-slice churn) and scan_layers=false (fastest step, 927 s
    # compile at the flagship).  Changes the stacked-param layout, so it is
    # a build-time choice, not checkpoint-compatible across values.
    scan_unroll: int = 1
    backend: str = "segment"
    shard_strategy: str = "none"  # none | gspmd | edges (halo) | heads (Ulysses)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [B, N, C]
        edge_data,
        cond: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        edge_data = edge_data.replace(
            edge_attr=TrainableEdgeFeatures(self.edge_trainable_size, name="trainable_edges")(
                edge_data.edge_attr
            )
        )
        halo = edge_data.halo_tables is not None
        n_orig = x.shape[1]
        if halo:
            # "edges" shard strategy: pad nodes to the partition layout
            # (S equal contiguous shards), permute static+trainable edge
            # features into the per-shard slot layout ONCE (each layer's
            # lin_edge then runs shard-local with zero gathers), and pin the
            # GSPMD layout so the shard_map blocks line up with the tables.
            from anemoi_tpu.parallel.halo import permute_rows
            from anemoi_tpu.parallel.mesh import maybe_shard

            S, n_local = edge_data.halo_tables["src_slots"].shape[:2]
            n_pad = S * n_local
            ea = edge_data.edge_attr
            e_perm = permute_rows(
                ea, edge_data.edge_perm, edge_data.edge_perm_inv
            ).reshape(S, -1, ea.shape[-1])
            e_perm = maybe_shard(e_perm, ("model", None, None))
            edge_data = edge_data.replace(edge_attr=e_perm)
            if n_pad > n_orig:
                x = jnp.pad(x, ((0, 0), (0, n_pad - n_orig), (0, 0)))
                if cond is not None and cond.ndim == 3 and cond.shape[1] == n_orig:
                    # per-node conditioning (diffusion noise embedding /
                    # ensemble noise) must follow the node padding
                    cond = jnp.pad(cond, ((0, 0), (0, n_pad - n_orig), (0, 0)))
            x = maybe_shard(x, (None, "model", None))
            if cond is not None and cond.ndim == 3:
                cond = maybe_shard(cond, (None, "model", None))
        elif self.shard_strategy == "heads":
            # Ulysses: pad the node axis to a multiple of the model-axis size
            # (shard_map needs even shards); attention masks the pad rows
            from anemoi_tpu.parallel.mesh import maybe_shard, model_axis_size

            S = model_axis_size()
            if S > 1:
                n_pad = -(-n_orig // S) * S
                if n_pad > n_orig:
                    x = jnp.pad(x, ((0, 0), (0, n_pad - n_orig), (0, 0)))
                    if cond is not None and cond.ndim == 3 and cond.shape[1] == n_orig:
                        cond = jnp.pad(
                            cond, ((0, 0), (0, n_pad - n_orig), (0, 0))
                        )
                x = maybe_shard(x, (None, "model", None))
                if cond is not None and cond.ndim == 3:
                    cond = maybe_shard(cond, (None, "model", None))
        block_kwargs = dict(
            num_heads=self.num_heads,
            hidden_dim=compute_mlp_hidden_dim(self.num_channels, self.mlp_hidden_ratio),
            out_channels=self.num_channels,
            attn_channels=self.attn_channels,
            qk_norm=self.qk_norm,
            edge_pre_mlp=self.edge_pre_mlp,
            mlp_implementation=self.mlp_implementation,
            conditional=self.conditional,
            backend=self.backend,
            shard_strategy=self.shard_strategy,
            valid_len=n_orig if self.shard_strategy == "heads" else None,
        )
        if self.scan_layers:
            unroll = max(int(self.scan_unroll), 1)
            assert self.num_layers % unroll == 0, (
                f"scan_unroll {unroll} must divide num_layers {self.num_layers}"
            )
            body_cls = _GTScanBody
            if self.gradient_checkpointing:
                body_cls = _remat(body_cls, self.remat_policy)
            scanned = nn.scan(
                body_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                in_axes=(nn.broadcast, nn.broadcast),
                length=self.num_layers // unroll,
            )(block_kwargs=block_kwargs, unroll=unroll, name="blocks")
            x, _ = scanned(x, edge_data, cond)
            return x[:, :n_orig] if x.shape[1] != n_orig else x
        block_cls = GraphTransformerProcessorBlock
        if self.gradient_checkpointing:
            block_cls = _remat(block_cls, self.remat_policy)
        for i in range(self.num_layers):
            x, edge_data = block_cls(**block_kwargs, name=f"blocks_{i}")(
                x, edge_data, cond
            )
        return x[:, :n_orig] if x.shape[1] != n_orig else x


class _GTScanBody(nn.Module):
    """nn.scan body: carry = node features; edge_data/cond broadcast.

    ``unroll`` > 1 puts that many DISTINCT blocks inside one scan iteration
    (partial unroll): per-iteration param slice churn drops by the factor
    while the program grows only `unroll` block copies."""

    block_kwargs: dict
    unroll: int = 1

    @nn.compact
    def __call__(self, x, edge_data, cond):
        if self.unroll <= 1:
            y, _ = GraphTransformerProcessorBlock(**self.block_kwargs, name="block")(
                x, edge_data, cond
            )
            return y, ()
        for i in range(self.unroll):
            x, _ = GraphTransformerProcessorBlock(
                **self.block_kwargs, name=f"block_{i}"
            )(x, edge_data, cond)
        return x, ()


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
    # full | save_attention | save_attention_mlp | dots (resolve_remat_policy);
    # keeps the attention kernels' out/lse (measured: o160 896->680 ms,
    # n320 1207->1046 ms vs full remat) at ~out+lse per layer extra HBM
    remat_policy: Optional[str] = "save_attention"
    scan_layers: bool = True
    backend: str = "padded"

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        edge_data,
        cond: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        edge_attr = TrainableEdgeFeatures(self.edge_trainable_size, name="trainable_edges")(
            edge_data.edge_attr
        )
        block_kwargs = dict(
            out_channels=self.num_channels,
            mlp_extra_layers=self.mlp_extra_layers,
            mlp_hidden_ratio=self.mlp_hidden_ratio,
            mlp_implementation=self.mlp_implementation,
            backend=self.backend,
        )
        block_cls = GraphConvProcessorBlock
        if self.gradient_checkpointing:
            block_cls = _remat(block_cls, self.remat_policy)
        # layer 0 embeds the raw edge attributes
        x, edge_attr = block_cls(
            **block_kwargs, edge_dim=edge_attr.shape[-1], name="blocks_0"
        )(x, edge_attr, edge_data, cond)
        if self.num_layers > 1:
            if self.scan_layers:
                body_cls = _GNNScanBody
                if self.gradient_checkpointing:
                    body_cls = _remat(body_cls, self.remat_policy)
                scanned = nn.scan(
                    body_cls,
                    variable_axes={"params": 0},
                    split_rngs={"params": True},
                    in_axes=(nn.broadcast, nn.broadcast),
                    length=self.num_layers - 1,
                )(block_kwargs=block_kwargs, name="blocks")
                (x, edge_attr), _ = scanned((x, edge_attr), edge_data, cond)
            else:
                for i in range(1, self.num_layers):
                    x, edge_attr = block_cls(**block_kwargs, name=f"blocks_{i}")(
                        x, edge_attr, edge_data, cond
                    )
        return x


class _GNNScanBody(nn.Module):
    """nn.scan body for GNN layers: carry = (x, edge_attr)."""

    block_kwargs: dict

    @nn.compact
    def __call__(self, carry, edge_data, cond):
        x, edge_attr = carry
        x, edge_attr = GraphConvProcessorBlock(**self.block_kwargs, name="block")(
            x, edge_attr, edge_data, cond
        )
        return (x, edge_attr), ()


class TransformerProcessorBlock(nn.Module):
    """Dense transformer block with sliding-window MHSA (ref block.py:126-200)."""

    num_channels: int
    hidden_dim: int
    num_heads: int
    window_size: Optional[int] = None
    attn_channels: Optional[int] = None
    qk_norm: bool = False
    softcap: Optional[float] = None
    use_alibi_slopes: bool = False
    use_rotary_embeddings: bool = False
    mlp_implementation: str = "mlp"
    conditional: bool = False
    attention_impl: str = "xla"  # "pallas" = fused flash banded kernel
    shard_strategy: str = "none"
    valid_len: Optional[int] = None

    @nn.compact
    def __call__(self, x, edge_data=None, cond=None):
        from anemoi_tpu.models.layers.attention import MultiHeadSelfAttention
        from anemoi_tpu.models.layers.graph_blocks import _norm
        from anemoi_tpu.models.layers.mlp import MLP

        cond_kw = {"cond": cond} if cond is not None else {}
        normed = _norm(self.conditional, "layer_norm_attention")(x, **cond_kw)
        x = x + MultiHeadSelfAttention(
            num_heads=self.num_heads,
            attn_channels=self.attn_channels,
            window_size=self.window_size,
            qk_norm=self.qk_norm,
            softcap=self.softcap,
            use_alibi_slopes=self.use_alibi_slopes,
            use_rotary_embeddings=self.use_rotary_embeddings,
            shard_strategy=self.shard_strategy,
            valid_len=self.valid_len,
            attention_impl=self.attention_impl,
            name="attention",
        )(normed)
        normed = _norm(self.conditional, "layer_norm_mlp")(x, **cond_kw)
        x = x + MLP(
            hidden_dim=self.hidden_dim,
            out_features=self.num_channels,
            layer_norm=False,
            implementation=self.mlp_implementation,
            name="mlp",
        )(normed)
        return x, edge_data


class _TransformerScanBody(nn.Module):
    block_kwargs: dict

    @nn.compact
    def __call__(self, x, edge_data, cond):
        y, _ = TransformerProcessorBlock(**self.block_kwargs, name="block")(
            x, edge_data, cond
        )
        return y, ()


class TransformerProcessor(nn.Module):
    """Stack of dense sliding-window transformer blocks over the hidden mesh
    (ref processor.py:204-319).  This is the reference's "transformer" model
    flavour; its Ulysses head-sharding maps to mesh all_to_all in round 2."""

    num_layers: int
    num_channels: int
    num_heads: int
    mlp_hidden_ratio: float = 4.0
    window_size: Optional[int] = None
    attn_channels: Optional[int] = None
    qk_norm: bool = False
    softcap: Optional[float] = None
    use_alibi_slopes: bool = False
    use_rotary_embeddings: bool = False
    mlp_implementation: str = "mlp"
    conditional: bool = False
    gradient_checkpointing: bool = True
    # full | save_attention | save_attention_mlp | dots (resolve_remat_policy);
    # keeps the attention kernels' out/lse (measured: o160 896->680 ms,
    # n320 1207->1046 ms vs full remat) at ~out+lse per layer extra HBM
    remat_policy: Optional[str] = "save_attention"
    scan_layers: bool = True
    attention_impl: str = "xla"  # "pallas" = fused flash banded kernel
    shard_strategy: str = "none"  # "heads": Ulysses over the 'model' axis

    @nn.compact
    def __call__(self, x, edge_data=None, cond=None):
        n_orig = x.shape[1]
        if self.shard_strategy == "heads":
            from anemoi_tpu.parallel.mesh import maybe_shard, model_axis_size

            S = model_axis_size()
            if S > 1:
                n_pad = -(-n_orig // S) * S
                if n_pad > n_orig:
                    x = jnp.pad(x, ((0, 0), (0, n_pad - n_orig), (0, 0)))
                x = maybe_shard(x, (None, "model", None))
        block_kwargs = dict(
            num_channels=self.num_channels,
            hidden_dim=compute_mlp_hidden_dim(self.num_channels, self.mlp_hidden_ratio),
            num_heads=self.num_heads,
            window_size=self.window_size,
            attn_channels=self.attn_channels,
            qk_norm=self.qk_norm,
            softcap=self.softcap,
            use_alibi_slopes=self.use_alibi_slopes,
            use_rotary_embeddings=self.use_rotary_embeddings,
            mlp_implementation=self.mlp_implementation,
            conditional=self.conditional,
            attention_impl=self.attention_impl,
            shard_strategy=self.shard_strategy,
            valid_len=n_orig if self.shard_strategy == "heads" else None,
        )
        if self.scan_layers:
            body_cls = _TransformerScanBody
            if self.gradient_checkpointing:
                body_cls = _remat(body_cls, self.remat_policy)
            scanned = nn.scan(
                body_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                in_axes=(nn.broadcast, nn.broadcast),
                length=self.num_layers,
            )(block_kwargs=block_kwargs, name="blocks")
            x, _ = scanned(x, edge_data, cond)
            return x[:, :n_orig] if x.shape[1] != n_orig else x
        block_cls = TransformerProcessorBlock
        if self.gradient_checkpointing:
            block_cls = _remat(block_cls, self.remat_policy)
        for i in range(self.num_layers):
            x, _ = block_cls(**block_kwargs, name=f"blocks_{i}")(x, edge_data, cond)
        return x[:, :n_orig] if x.shape[1] != n_orig else x


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
        edge_data=None,
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

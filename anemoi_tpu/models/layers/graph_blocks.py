"""Graph network building blocks (flax.linen).

Equivalents of /root/reference/models/src/anemoi/models/layers/block.py:
- GraphTransformerMapperBlock   (ref :870-1032)
- GraphTransformerProcessorBlock(ref :1032-1280)
- GraphConvMapperBlock / GraphConvProcessorBlock (ref :361-480)

Conventions (TPU-first):
- node features are ``[batch, N, C]``; edge features ``[E, F]`` are shared
  across the batch (the graph is static), so edge projections are computed
  once and broadcast through `jax.vmap`,
- edges arrive as an :class:`~anemoi_tpu.models.graph.EdgeData` pytree
  (dst-sorted edge_index + optional padded-CSR tables),
- sparse attention dispatches between backends:
    "segment" -- jax segment ops (reference semantics, scatter-based)
    "padded"  -- scatter-free padded-CSR gathers (TPU default)
    "paged"   -- fused paged Pallas kernel on sub-graphs carrying slot tables
                 (ops/pallas/paged_gt.py), padded fallback elsewhere
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from anemoi_tpu.models.layers.mlp import MLP, compute_mlp_hidden_dim
from anemoi_tpu.models.layers.normalization import (
    ConditionalLayerNorm,
    LayerNorm,
    QKNorm,
    RMSNorm,
)
from anemoi_tpu.ops.padded import (
    gather_dst_to_edges,
    gather_src_to_edges,
    padded_conv_aggregate,
    padded_gt_attention,
)
from anemoi_tpu.ops.segment import graph_conv_aggregate, graph_transformer_attention


def _gt_attention(query, key, value, edges_proj, edge_data, num_dst, backend: str):
    """Dispatch sparse graph attention over the batch axis.

    query: [B, N_dst, H, D]; key/value: [B, N_src, H, D]; edges_proj: [E, H, D].
    """
    if backend in ("padded", "paged"):
        # "paged" without slot tables (e.g. mapper edge sets) falls back to
        # the scatter-free padded path
        if edge_data.bucket_tables is not None:
            from anemoi_tpu.ops.padded import padded_gt_attention_bucketed_heads

            def fn(q, k, v, e, tbl, src_tbl, src_rank):
                return padded_gt_attention_bucketed_heads(
                    q, k, v, e, tbl, edge_data.bucket_spans,
                    src_tables=src_tbl, src_spans=edge_data.src_range_spans,
                    src_rank=src_rank,
                )

            return jax.vmap(fn, in_axes=(0, 0, 0, None, None, None, None))(
                query, key, value, edges_proj, edge_data.bucket_tables,
                edge_data.src_range_tables, edge_data.src_range_perm,
            )
        assert edge_data.tables is not None, "padded backend needs PaddedCSR tables"
        return jax.vmap(padded_gt_attention, in_axes=(0, 0, 0, None, None))(
            query, key, value, edges_proj, edge_data.tables
        )
    fn = partial(graph_transformer_attention, num_dst=num_dst)
    return jax.vmap(fn, in_axes=(0, 0, 0, None, None))(
        query, key, value, edges_proj, edge_data.edge_index
    )


def _conv_aggregate(edges_new, edge_data, num_dst, backend: str):
    """Dispatch the GNN segment-sum aggregation. edges_new: [B, E, C]."""
    if backend != "segment" and edge_data.tables is not None:
        return jax.vmap(padded_conv_aggregate, in_axes=(0, None))(
            edges_new, edge_data.tables
        )
    dst = edge_data.edge_index[1]
    return jax.vmap(partial(graph_conv_aggregate, num_dst=num_dst), in_axes=(0, None))(
        edges_new, dst
    )


def _gather_edge_endpoints(x_src, x_dst, edge_data, backend: str):
    """Per-edge endpoint features [B, E, C] with gather-only backward when
    padded tables are available."""
    if backend != "segment" and edge_data.tables is not None:
        x_j = jax.vmap(gather_src_to_edges, in_axes=(0, None))(x_src, edge_data.tables)
        x_i = jax.vmap(gather_dst_to_edges, in_axes=(0, None))(x_dst, edge_data.tables)
        return x_i, x_j
    src, dst = edge_data.edge_index[0], edge_data.edge_index[1]
    return jnp.take(x_dst, dst, axis=1), jnp.take(x_src, src, axis=1)


def _norm(conditional: bool, name: str):
    return ConditionalLayerNorm(name=name) if conditional else LayerNorm(name=name)


class GraphTransformerAttention(nn.Module):
    """The shared q/k/v/edge projection + sparse attention
    (GraphTransformerBaseBlock.get_qkve/_forward_edges_sharded_attention,
    ref block.py:624-700)."""

    num_heads: int
    attn_channels: int
    out_channels: int
    qk_norm: bool = False
    qk_norm_type: str = "layernorm"  # reference default kernel (utils.py:107)
    edge_pre_mlp: bool = False
    backend: str = "segment"
    shard_strategy: str = "none"
    valid_len: Optional[int] = None  # true node count before mesh padding

    @nn.compact
    def __call__(
        self,
        x_src: jnp.ndarray,  # [B, N_src, C]
        x_dst: jnp.ndarray,  # [B, N_dst, C]
        edge_data,
    ) -> jnp.ndarray:
        h, hd = self.num_heads, self.attn_channels
        assert hd % h == 0, f"attn_channels {hd} not divisible by num_heads {h}"
        d = hd // h
        batch, n_dst = x_dst.shape[0], x_dst.shape[1]
        n_src = x_src.shape[1]

        use_paged = (
            self.backend == "paged" and edge_data.paged_tables is not None
        )
        query = nn.Dense(hd, name="lin_query")(x_dst)
        key = nn.Dense(hd, name="lin_key")(x_src)
        value = nn.Dense(hd, name="lin_value")(x_src)
        e = edge_data.edge_attr.astype(x_src.dtype)
        if use_paged:
            # gather the RAW (few-feature) attrs into slot layout and project
            # AFTER: row-selection and the row-wise projection commute, the
            # gather moves ~HD/F fewer bytes, and the backward needs no
            # slot->edge gather at all (lin_edge grads contract in slot space)
            # EdgeData.replace clears edge_attr_slots on any edge_attr
            # swap, so a non-None slot tensor is guaranteed to be the
            # build-time gather of THIS edge_attr; the width check guards
            # trainable widening (TrainableEdgeFeatures concatenates)
            if (
                edge_data.edge_attr_slots is not None
                and e.shape[-1] == edge_data.edge_attr_slots.shape[-1]
            ):
                # STATIC attrs (no trainable widening): use the slot layout
                # precomputed at graph-input build time -- the narrow-lane
                # in-step gather is measurable (n320 decoder ~9 ms/step)
                e = edge_data.edge_attr_slots.astype(x_src.dtype)
            else:
                from anemoi_tpu.ops.pallas.paged_gt import to_slot_layout

                tab = edge_data.paged_tables
                e = to_slot_layout(e, tab.slot_gather, tab.edge_slot)
        # fuse the lin_edge projection INTO the paged kernel where it composes
        # (single-device / GSPMD paged path, AND per-shard inside the halo
        # shard_map): the projected [*, HD] edge tensor never exists in HBM;
        # same lin_edge param names
        import os as _os

        fuse_env = _os.environ.get("ANEMOI_PAGED_FUSE_EDGE", "1") == "1"
        use_fe = (
            use_paged
            and not self.edge_pre_mlp
            and edge_data.halo_tables is None
            and fuse_env
        )
        if use_fe and self.shard_strategy == "heads":
            from anemoi_tpu.parallel.mesh import model_axis_size as _mas

            use_fe = _mas() <= 1
        use_fe_halo = (
            self.backend == "paged"
            and not self.edge_pre_mlp
            and fuse_env
            and edge_data.halo_tables is not None
            and edge_data.halo_paged_meta is not None
            and (
                "pg_blk_ids" in edge_data.halo_tables
                or "int_pg_blk_ids" in edge_data.halo_tables
            )
        )
        raw_p = w_aug = None
        if use_fe or use_fe_halo:
            from anemoi_tpu.ops.pallas.paged_gt import (
                EDGE_LANES,
                augment_edge_weights,
                pad_raw_edge_features,
            )

            lin_edge = nn.Dense(hd, name="lin_edge")
            _ = lin_edge(e[..., :1, :])  # create/bind the params (unused)
            if use_fe:
                raw_p = pad_raw_edge_features(e)
                fp = raw_p.shape[-1]
            else:
                # halo path pads per shard AFTER the slot gather
                fp = -(-(e.shape[-1] + 1) // EDGE_LANES) * EDGE_LANES
            w_aug = augment_edge_weights(
                lin_edge.variables["params"]["kernel"],
                lin_edge.variables["params"]["bias"],
                fp,
            )
            edges = None
        else:
            if self.edge_pre_mlp:
                e = MLP(
                    hidden_dim=e.shape[-1], out_features=e.shape[-1], layer_norm=False,
                    name="edge_pre_mlp",
                )(e)
            edges = nn.Dense(hd, name="lin_edge")(e)

        if edge_data.halo_tables is not None:
            # model-parallel "edges" strategy: flat [B, N_pad, HD] activations
            # (node axis GSPMD-sharded over 'model'), per-shard edge features
            # already permuted to [S, E_loc, F] by the processor, attention
            # under shard_map with one halo all_to_all (parallel/halo.py)
            from anemoi_tpu.parallel.halo import halo_gt_attention

            if self.qk_norm:
                query = QKNorm(self.qk_norm_type, name="q_norm")(
                    query.reshape(batch, n_dst, h, d)
                ).reshape(batch, n_dst, hd)
                key = QKNorm(self.qk_norm_type, name="k_norm")(
                    key.reshape(batch, n_src, h, d)
                ).reshape(batch, n_src, hd)
            return halo_gt_attention(
                query, key, value,
                e if use_fe_halo else edges,
                edge_data.halo_tables, h,
                paged_meta=edge_data.halo_paged_meta,
                w_aug=w_aug if use_fe_halo else None,
            )

        if self.shard_strategy == "heads":
            # Ulysses "heads" strategy for sparse GT attention: flat q/k/v,
            # full global tables per shard, H/S heads each (parallel/heads.py)
            from anemoi_tpu.parallel.heads import ulysses_gt_attention
            from anemoi_tpu.parallel.mesh import model_axis_size

            if model_axis_size() > 1:
                if self.qk_norm:
                    query = QKNorm(self.qk_norm_type, name="q_norm")(
                        query.reshape(batch, n_dst, h, d)
                    ).reshape(batch, n_dst, hd)
                    key = QKNorm(self.qk_norm_type, name="k_norm")(
                        key.reshape(batch, n_src, h, d)
                    ).reshape(batch, n_src, hd)
                return ulysses_gt_attention(
                    query, key, value, edges, edge_data.tables, h,
                    valid_len=self.valid_len,
                )

        if use_paged:
            # fused paged Pallas kernel: flat [N, HD] tensors, slot-layout
            # edge features (already gathered above), static Python loop over
            # the (small, static) batch axis
            import os

            from anemoi_tpu.ops.pallas.paged_gt import (
                paged_gt_attention_flat,
                paged_gt_attention_flat_fe,
            )

            if self.qk_norm:
                query = QKNorm(self.qk_norm_type, name="q_norm")(
                    query.reshape(batch, n_dst, h, d)
                ).reshape(batch, n_dst, hd)
                key = QKNorm(self.qk_norm_type, name="k_norm")(
                    key.reshape(batch, n_src, h, d)
                ).reshape(batch, n_src, hd)
            tab = edge_data.paged_tables
            stab = os.environ.get("ANEMOI_PAGED_STABILIZE", "1") == "1"
            if use_fe:
                out = jnp.stack(
                    [
                        paged_gt_attention_flat_fe(
                            query[b], key[b], value[b], raw_p, w_aug, h, tab, stab
                        )
                        for b in range(batch)
                    ],
                    axis=0,
                )
            else:
                out = jnp.stack(
                    [
                        paged_gt_attention_flat(
                            query[b], key[b], value[b], edges, h, tab, stab
                        )
                        for b in range(batch)
                    ],
                    axis=0,
                )
            return out

        query = query.reshape(batch, n_dst, h, d)
        key = key.reshape(batch, n_src, h, d)
        value = value.reshape(batch, n_src, h, d)
        edges = edges.reshape(-1, h, d)

        if self.qk_norm:
            query = QKNorm(self.qk_norm_type, name="q_norm")(query)
            key = QKNorm(self.qk_norm_type, name="k_norm")(key)

        out = _gt_attention(query, key, value, edges, edge_data, n_dst, self.backend)
        return out.reshape(batch, n_dst, hd)


class GraphTransformerMapperBlock(nn.Module):
    """Bipartite graph-transformer block (ref block.py:870-1032)."""

    num_heads: int
    hidden_dim: int  # MLP hidden
    out_channels: int
    attn_channels: Optional[int] = None
    qk_norm: bool = False
    qk_norm_type: str = "layernorm"  # reference default kernel (utils.py:107)
    update_src_nodes: bool = False
    edge_pre_mlp: bool = False
    mlp_implementation: str = "mlp"
    conditional: bool = False
    backend: str = "segment"

    @nn.compact
    def __call__(
        self,
        x: Tuple[jnp.ndarray, jnp.ndarray],  # ([B,N_src,C], [B,N_dst,C])
        edge_data,
        cond: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    ):
        x_skip = x
        attn_channels = self.attn_channels or self.out_channels
        cond_src = {"cond": cond[0]} if cond is not None else {}
        cond_dst = {"cond": cond[1]} if cond is not None else {}

        x_src = _norm(self.conditional, "layer_norm_attention_src")(x[0], **cond_src)
        x_dst = _norm(self.conditional, "layer_norm_attention_dst")(x[1], **cond_dst)

        x_r = nn.Dense(attn_channels, name="lin_self")(x_dst)
        out = GraphTransformerAttention(
            num_heads=self.num_heads,
            attn_channels=attn_channels,
            out_channels=self.out_channels,
            qk_norm=self.qk_norm,
            qk_norm_type=self.qk_norm_type,
            edge_pre_mlp=self.edge_pre_mlp,
            backend=self.backend,
            name="attention",
        )(x_src, x_dst, edge_data)

        out = nn.Dense(self.out_channels, name="projection")(out + x_r)
        out = out + x_skip[1]

        normed = _norm(self.conditional, "layer_norm_mlp_dst")(out, **cond_dst)
        nodes_new_dst = MLP(
            hidden_dim=self.hidden_dim,
            out_features=self.out_channels,
            layer_norm=False,
            implementation=self.mlp_implementation,
            name="node_dst_mlp",
        )(normed) + out

        if self.update_src_nodes:
            normed_src = _norm(self.conditional, "layer_norm_mlp_src")(x_skip[0], **cond_src)
            nodes_new_src = MLP(
                hidden_dim=self.hidden_dim,
                out_features=self.out_channels,
                layer_norm=False,
                implementation=self.mlp_implementation,
                name="node_src_mlp",
            )(normed_src) + x_skip[0]
        else:
            nodes_new_src = x_skip[0]

        return (nodes_new_src, nodes_new_dst), edge_data


class GraphTransformerProcessorBlock(nn.Module):
    """Homogeneous graph-transformer block (ref block.py:1032-1280)."""

    num_heads: int
    hidden_dim: int
    out_channels: int
    attn_channels: Optional[int] = None
    qk_norm: bool = False
    qk_norm_type: str = "layernorm"  # reference default kernel (utils.py:107)
    edge_pre_mlp: bool = False
    mlp_implementation: str = "mlp"
    conditional: bool = False
    backend: str = "segment"
    shard_strategy: str = "none"
    valid_len: Optional[int] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [B, N, C]
        edge_data,
        cond: Optional[jnp.ndarray] = None,
    ):
        x_skip = x
        attn_channels = self.attn_channels or self.out_channels
        cond_kw = {"cond": cond} if cond is not None else {}

        x = _norm(self.conditional, "layer_norm_attention")(x, **cond_kw)
        x_r = nn.Dense(attn_channels, name="lin_self")(x)
        out = GraphTransformerAttention(
            num_heads=self.num_heads,
            attn_channels=attn_channels,
            out_channels=self.out_channels,
            qk_norm=self.qk_norm,
            qk_norm_type=self.qk_norm_type,
            edge_pre_mlp=self.edge_pre_mlp,
            backend=self.backend,
            shard_strategy=self.shard_strategy,
            valid_len=self.valid_len,
            name="attention",
        )(x, x, edge_data)

        out = nn.Dense(self.out_channels, name="projection")(out + x_r)
        out = out + x_skip
        normed = _norm(self.conditional, "layer_norm_mlp")(out, **cond_kw)
        nodes_new = MLP(
            hidden_dim=self.hidden_dim,
            out_features=self.out_channels,
            layer_norm=False,
            implementation=self.mlp_implementation,
            name="node_dst_mlp",
        )(normed) + out
        return nodes_new, edge_data


class _FFNInKernel(nn.Module):
    """Parameter holder matching ``MLP/ffn_in/linear`` exactly (same names,
    shapes and init over the FULL fan-in) so checkpoints and reference ports
    are layout-identical to the undecomposed MLP."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        class _Lin(nn.Module):
            in_features: int
            features: int

            @nn.compact
            def __call__(inner):
                k = inner.param(
                    "kernel", nn.initializers.lecun_normal(),
                    (inner.in_features, inner.features), jnp.float32,
                )
                b = inner.param(
                    "bias", nn.initializers.zeros, (inner.features,), jnp.float32
                )
                return k, b

        return _Lin(self.in_features, self.features, name="linear")()


class _DecomposedEdgeMLP(nn.Module):
    """The conv edge MLP with its first layer DECOMPOSED (TPU optimisation):

        MLP([x_i, x_j, e]) == act(x_i @ Wi + x_j @ Wj + e @ We + b) -> tail

    The node terms ``x @ Wi/Wj`` run once per NODE and are gathered to edges
    (E/N ~ 8 on the multiscale mesh, so the dominant first-layer matmul
    shrinks ~2.4x) and the ``[E, 3C]`` concatenation never exists in HBM --
    mathematically identical to the reference's torch conv (conv.py:29-81,
    parity-gated), with a bit-identical parameter layout."""

    hidden_dim: int
    out_features: int
    n_extra_layers: int
    activation: str = "gelu"
    backend: str = "padded"

    @nn.compact
    def __call__(self, x_src, x_dst, edge_attr, edge_data):
        from jax.ad_checkpoint import checkpoint_name

        from anemoi_tpu.models.layers.mlp import FeedForwardLayer, get_activation

        c_dst, c_src, f = x_dst.shape[-1], x_src.shape[-1], edge_attr.shape[-1]
        k, b = _FFNInKernel(c_dst + c_src + f, self.hidden_dim, name="ffn_in")()
        dt = jnp.promote_types(x_dst.dtype, k.dtype)  # flax Dense semantics
        k, b = k.astype(dt), b.astype(dt)
        wi, wj, we = k[:c_dst], k[c_dst:c_dst + c_src], k[c_dst + c_src:]
        # per-node projections, gathered to edge endpoints
        p_i, p_j = _gather_edge_endpoints(
            x_src.astype(dt) @ wj, x_dst.astype(dt) @ wi, edge_data, self.backend
        )
        h = checkpoint_name(
            get_activation(self.activation)(
                p_i + p_j + edge_attr.astype(dt) @ we + b
            ),
            "mlp_hidden",
        )
        for i in range(self.n_extra_layers):
            h = FeedForwardLayer(
                self.hidden_dim, self.activation, "mlp", name=f"ffn_{i}"
            )(h)
        h = nn.Dense(self.out_features, name="linear_out")(h)
        return LayerNorm(name="norm")(h)


class GraphConv(nn.Module):
    """GNN message function + aggregation (ref conv.py:29-81):
    e_new = MLP([x_dst, x_src, e]) + e ; out = scatter_sum(e_new, dst)."""

    out_channels: int
    mlp_extra_layers: int = 0
    mlp_implementation: str = "mlp"
    backend: str = "padded"

    @nn.compact
    def __call__(
        self,
        x_src: jnp.ndarray,  # [B, N_src, C]
        x_dst: jnp.ndarray,  # [B, N_dst, C]
        edge_attr: jnp.ndarray,  # [B, E, C] (already embedded / updated)
        edge_data,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        n_dst = x_dst.shape[1]
        if self.mlp_implementation == "mlp":
            # first layer decomposed: node terms once per node, no [E, 3C]
            # concat (identical math + param layout; see _DecomposedEdgeMLP)
            edges_new = _DecomposedEdgeMLP(
                hidden_dim=self.out_channels,
                out_features=self.out_channels,
                n_extra_layers=self.mlp_extra_layers + 1,
                backend=self.backend,
                name="edge_mlp",
            )(x_src, x_dst, edge_attr, edge_data) + edge_attr
        else:  # gated GLU variants keep the reference-shaped path
            x_i, x_j = _gather_edge_endpoints(x_src, x_dst, edge_data, self.backend)
            edges_new = MLP(
                hidden_dim=self.out_channels,
                out_features=self.out_channels,
                n_extra_layers=self.mlp_extra_layers + 1,
                implementation=self.mlp_implementation,
                name="edge_mlp",
            )(jnp.concatenate([x_i, x_j, edge_attr], axis=-1)) + edge_attr
        out = _conv_aggregate(edges_new, edge_data, n_dst, self.backend)
        return out, edges_new


class GraphConvProcessorBlock(nn.Module):
    """GNN processor block (ref block.py:361-396)."""

    out_channels: int
    mlp_extra_layers: int = 0
    mlp_hidden_ratio: float = 1.0
    edge_dim: Optional[int] = None  # set on the first layer to embed raw edge attrs
    mlp_implementation: str = "mlp"
    backend: str = "padded"

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [B, N, C]
        edge_attr: jnp.ndarray,  # [B, E, C] or [E, F] raw on first layer
        edge_data,
        cond: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        hidden = compute_mlp_hidden_dim(self.out_channels, self.mlp_hidden_ratio)
        if self.edge_dim is not None:
            edge_attr = MLP(
                hidden_dim=hidden,
                out_features=self.out_channels,
                n_extra_layers=self.mlp_extra_layers + 1,
                implementation=self.mlp_implementation,
                name="emb_edges",
            )(edge_attr)
            if edge_attr.ndim == 2:  # broadcast static edges over batch
                edge_attr = jnp.broadcast_to(
                    edge_attr[None], (x.shape[0],) + edge_attr.shape
                )
        out, edges_new = GraphConv(
            out_channels=self.out_channels,
            mlp_extra_layers=self.mlp_extra_layers,
            mlp_implementation=self.mlp_implementation,
            backend=self.backend,
            name="conv",
        )(x, x, edge_attr, edge_data)
        nodes_new = MLP(
            hidden_dim=hidden,
            out_features=self.out_channels,
            n_extra_layers=self.mlp_extra_layers + 1,
            implementation=self.mlp_implementation,
            name="node_mlp",
        )(jnp.concatenate([x, out], axis=-1)) + x
        return nodes_new, edges_new


class GraphConvMapperBlock(nn.Module):
    """GNN mapper block (ref block.py:398-480)."""

    out_channels: int
    mlp_extra_layers: int = 0
    mlp_hidden_ratio: float = 1.0
    update_src_nodes: bool = True
    mlp_implementation: str = "mlp"
    backend: str = "padded"

    @nn.compact
    def __call__(
        self,
        x: Tuple[jnp.ndarray, jnp.ndarray],
        edge_attr: jnp.ndarray,  # [B, E, C] already embedded
        edge_data,
        cond=None,
    ):
        hidden = compute_mlp_hidden_dim(self.out_channels, self.mlp_hidden_ratio)
        x_src, x_dst = x
        out, edges_new = GraphConv(
            out_channels=self.out_channels,
            mlp_extra_layers=self.mlp_extra_layers,
            mlp_implementation=self.mlp_implementation,
            backend=self.backend,
            name="conv",
        )(x_src, x_dst, edge_attr, edge_data)
        node_mlp = MLP(
            hidden_dim=hidden,
            out_features=self.out_channels,
            n_extra_layers=self.mlp_extra_layers + 1,
            implementation=self.mlp_implementation,
            name="node_mlp",
        )
        nodes_new_dst = node_mlp(jnp.concatenate([x_dst, out], axis=-1)) + x_dst
        if self.update_src_nodes:
            nodes_new_src = node_mlp(jnp.concatenate([x_src, x_src], axis=-1)) + x_src
        else:
            nodes_new_src = x_src
        return (nodes_new_src, nodes_new_dst), edges_new


class PointWiseMLPBlock(nn.Module):
    """Point-wise MLP processor block (ref block.py:89-125)."""

    num_channels: int
    hidden_dim: int
    activation: str = "gelu"

    @nn.compact
    def __call__(self, x: jnp.ndarray, *args, **kwargs) -> jnp.ndarray:
        from anemoi_tpu.models.layers.mlp import get_activation

        h = nn.Dense(self.hidden_dim, name="linear_in")(x)
        h = LayerNorm(name="norm")(h)
        h = get_activation(self.activation)(h)
        if self.num_channels != self.hidden_dim:
            h = nn.Dense(self.num_channels, name="linear_out")(h)
        return h

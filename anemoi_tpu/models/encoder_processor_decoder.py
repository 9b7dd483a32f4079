"""Encoder-processor-decoder graph model (flax.linen).

Equivalent of /root/reference/models/src/anemoi/models/models/encoder_processor_decoder.py:33-340
(AnemoiModelEncProcDec) + the shape/index bookkeeping of models/base.py:38-395.

Data flow (ref forward :185-330):
  per dataset: [B,T,E,G,V] -> flatten (B,E)->B', (T,V)->features, concat node
  attrs -> encoder mapper (data->hidden) -> sum latents -> processor over the
  hidden mesh -> latent skip -> per dataset decoder (hidden->data) -> residual
  add on prognostics -> boundings.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from anemoi_tpu.data_indices.collection import IndexCollection
from anemoi_tpu.models import model_registry
from anemoi_tpu.models.graph import ModelGraph
from anemoi_tpu.models.layers.bounding import build_boundings
from anemoi_tpu.models.layers.embed import TrainableNodeAttributes
from anemoi_tpu.models.layers.mapper import (
    GNNBackwardMapper,
    GNNForwardMapper,
    GraphTransformerBackwardMapper,
    GraphTransformerForwardMapper,
    PointWiseBackwardMapper,
    PointWiseForwardMapper,
    TransformerBackwardMapper,
    TransformerForwardMapper,
)
from anemoi_tpu.models.layers.processor import (
    GNNProcessor,
    GraphTransformerProcessor,
    PointWiseMLPProcessor,
    TransformerProcessor,
)
from anemoi_tpu.models.layers.residual import build_residual

ENCODERS = {
    "GraphTransformerForwardMapper": GraphTransformerForwardMapper,
    "GNNForwardMapper": GNNForwardMapper,
    "TransformerForwardMapper": TransformerForwardMapper,
    "PointWiseForwardMapper": PointWiseForwardMapper,
}
DECODERS = {
    "GraphTransformerBackwardMapper": GraphTransformerBackwardMapper,
    "GNNBackwardMapper": GNNBackwardMapper,
    "TransformerBackwardMapper": TransformerBackwardMapper,
    "PointWiseBackwardMapper": PointWiseBackwardMapper,
}
PROCESSORS = {
    "GraphTransformerProcessor": GraphTransformerProcessor,
    "GNNProcessor": GNNProcessor,
    "TransformerProcessor": TransformerProcessor,
    "PointWiseMLPProcessor": PointWiseMLPProcessor,
}


def _field_filter(cls, cfg: dict) -> dict:
    """Keep only config keys that are fields of the component class.

    Preset composition merges defaults across flavours, so a config may carry
    keys another flavour used (e.g. gnn's mlp_extra_layers after switching the
    encoder to a Transformer mapper); drop them with a warning instead of
    crashing."""
    import dataclasses
    import logging

    valid = {f.name for f in dataclasses.fields(cls)}
    dropped = sorted(set(cfg) - valid)
    if dropped:
        logging.getLogger(__name__).warning(
            "%s ignoring config keys %s", cls.__name__, dropped
        )
    return {k: v for k, v in cfg.items() if k in valid}


def _build_encoder(
    cfg: dict, hidden_dim: int, backend: str, module_name: str | None = None
) -> nn.Module:
    cfg = dict(cfg)
    cls = ENCODERS[cfg.pop("name", "GraphTransformerForwardMapper")]
    cfg.pop("sub_graph_edge_attributes", None)
    cfg.pop("edge_provider", None)
    trainable = cfg.pop("trainable_size", 0)
    cfg = _field_filter(cls, cfg)
    if module_name is not None:
        cfg["name"] = module_name
    return cls(hidden_dim=hidden_dim, edge_trainable_size=trainable, backend=backend, **cfg)


def _dynamic_edge_data(provider_cfg: dict, src_feat, dst_feat):
    """Runtime (in-jit) kNN edge data for one mapper -- the working
    equivalent of the reference's DynamicGraphProvider hook
    (/root/reference/models/src/anemoi/models/layers/graph_provider.py:341):
    edges + attributes + scatter-free backward tables all built at trace time
    from node coordinates (ops/dynamic.py)."""
    from anemoi_tpu.models.graph import EdgeData
    from anemoi_tpu.ops.dynamic import runtime_edge_attributes, runtime_knn_tables

    k = int(provider_cfg.get("num_nearest_neighbours", 3))
    ns, nd = int(src_feat.shape[0]), int(dst_feat.shape[0])
    default_k_out = 4 * k * max(1, -(-nd // ns))
    k_out = int(provider_cfg.get("max_out_degree", default_k_out))
    tables = runtime_knn_tables(src_feat, dst_feat, k, k_out)
    attrs = tuple(provider_cfg.get("attributes", ("edge_dirs", "edge_length")))
    edge_attr = runtime_edge_attributes(src_feat, dst_feat, tables, attrs)
    return EdgeData(
        edge_attr=edge_attr,
        edge_index=jnp.stack([tables.edge_src, tables.edge_dst]),
        tables=tables,
    )


def _build_decoder(
    cfg: dict, hidden_dim: int, out_channels: int, backend: str,
    module_name: str | None = None,
) -> nn.Module:
    cfg = dict(cfg)
    cls = DECODERS[cfg.pop("name", "GraphTransformerBackwardMapper")]
    cfg.pop("sub_graph_edge_attributes", None)
    cfg.pop("edge_provider", None)
    trainable = cfg.pop("trainable_size", 0)
    cfg = _field_filter(cls, cfg)
    if module_name is not None:
        cfg["name"] = module_name
    return cls(
        hidden_dim=hidden_dim,
        out_channels_dst=out_channels,
        edge_trainable_size=trainable,
        backend=backend,
        **cfg,
    )


def _build_processor(
    cfg: dict, num_channels: int, backend: str, shard_strategy: str = "none",
    module_name: str | None = None,
) -> nn.Module:
    cfg = dict(cfg)
    cls = PROCESSORS[cfg.pop("name", "GraphTransformerProcessor")]
    cfg.pop("sub_graph_edge_attributes", None)
    trainable = cfg.pop("trainable_size", 0)
    # the model-level shard strategy flows to the processor (the component the
    # reference parallelises, graphtransformer.yaml `shard_strategy`); the
    # gspmd flavour needs no processor-side handling
    if shard_strategy in ("edges", "heads"):
        cfg.setdefault("shard_strategy", shard_strategy)
    cfg = _field_filter(cls, cfg)
    if module_name is not None:
        cfg["name"] = module_name
    if cls in (PointWiseMLPProcessor, TransformerProcessor):
        return cls(num_channels=num_channels, **cfg)
    return cls(
        num_channels=num_channels, edge_trainable_size=trainable, backend=backend, **cfg
    )


@model_registry.register("AnemoiModelEncProcDec")
class AnemoiModelEncProcDec(nn.Module):
    """The deterministic encoder-processor-decoder workhorse."""

    graph: ModelGraph
    data_indices: Dict[str, IndexCollection]
    config: dict  # model config subtree (num_channels, encoder/processor/decoder, ...)

    @property
    def num_channels(self) -> int:
        return int(self.config["num_channels"])

    @property
    def n_step_input(self) -> int:
        return int(self.config.get("n_step_input", 2))

    @property
    def n_step_output(self) -> int:
        return int(self.config.get("n_step_output", 1))

    @property
    def latent_skip(self) -> bool:
        return bool(self.config.get("latent_skip", True))

    @property
    def attention_backend(self) -> str:
        return str(self.config.get("graph_attention_backend", "padded"))

    @property
    def shard_strategy(self) -> str:
        """Model-parallel strategy over the 'model' mesh axis (ref
        config/model/graphtransformer.yaml `shard_strategy`):
        none | gspmd (sharding constraints only) | edges (halo exchange in
        the processor) | heads (Ulysses all_to_all in the processor).

        gspmd + the paged backend silently UPGRADES to the halo (edges)
        path: GSPMD cannot partition a ``pallas_call``, so staying on pure
        constraint propagation would drop the flagship kernel for padded
        tables (docs/design.md §7) exactly when the user picked the
        default-looking option.  The halo path computes the identical math
        (parity-gated) and keeps the kernel per shard.  Opt out with
        ``gspmd_paged_upgrade: false``."""
        s = str(self.config.get("shard_strategy", "none"))
        if s == "none" and self.config.get("shard_over_mesh", False):
            s = "gspmd"  # backwards-compatible alias
        if (
            s == "gspmd"
            and self.attention_backend == "paged"
            and int(self.config.get("num_model_shards", 1)) > 1
            and bool(self.config.get("gspmd_paged_upgrade", True))
            and str(
                (self.config.get("processor") or {}).get("name", "")
            ).startswith("GraphTransformer")
        ):
            return "edges"
        return s

    def _maybe_shard(self, x: jnp.ndarray, spec) -> jnp.ndarray:
        """Apply a sharding constraint when running under a mesh (GSPMD model
        parallelism: the latent/grid node dim shards over the 'model' axis and
        XLA inserts the gather/scatter collectives; SURVEY.md §2.3 TPU notes)."""
        from anemoi_tpu.parallel.mesh import maybe_shard

        if self.shard_strategy == "none":
            return x
        return maybe_shard(x, spec)

    def _noise_hook(self, x_latent: jnp.ndarray):
        """Hook between encoder and processor; ensemble models inject noise."""
        return x_latent, None

    def input_dim(self, ds: str) -> int:
        trainable = self.config.get("trainable_parameters", {}) or {}
        return (
            self.n_step_input * self.data_indices[ds].num_model_input_vars
            + self.graph.node_features[ds].shape[1]
            + int(trainable.get(ds, 0))
        )

    def output_dim(self, ds: str) -> int:
        return self.n_step_output * self.data_indices[ds].num_model_output_vars

    def build_graph_inputs(self, dtype=jnp.float32, inference: bool = False,
                           base: Optional[Dict] = None) -> Dict:
        """Device-side graph arrays passed to __call__ as ARGUMENTS.

        Critical for compile time: closed-over arrays get inlined as HLO
        constants, which the TPU toolchain compiles ~13x slower than the same
        program with the arrays as entry parameters (measured: 395s vs 29s for
        one attention grad).

        ``base``: a previously built (training) table set to share arrays
        with -- node_features and the processor are always identical at
        inference, and mapper entries are reused whenever their block sizes
        match (the fused_bwd flag is static aux, flipped without copying), so
        the serving tables cost no extra HBM unless a mapper really changes
        page size."""
        padded = self.attention_backend != "segment"
        # degree-bucketed gather tables (~2x less padded gather volume) where
        # the dst set was degree-sorted; safe everywhere -- falls back to one
        # bucket when there is no win
        bucketed = padded and bool(self.config.get("bucketed_gathers", True))
        # "paged" = fused paged Pallas kernel on the processor sub-graph
        # (ops/pallas/paged_gt.py; wants SortNodesBySpaceFillingCurve node
        # order); mapper edge sets fall back to the padded path
        # GSPMD cannot partition a pallas_call and the halo/heads strategies
        # bring their own attention tables: the paged kernel is the
        # single-shard-per-device fast path, padded elsewhere
        paged = self.attention_backend == "paged" and self.shard_strategy == "none"
        paged_block = tuple(self.config.get("paged_block", (256, 256, 128)))
        # mapper edge sets run paged too (bipartite kernel); reduced-Gaussian
        # ring order is spatially local enough that big source pages keep the
        # slot padding ~1.5x without reordering the data grid
        paged_mappers = paged and bool(self.config.get("paged_mappers", True))
        # the kv-reduce kernel holds a [page, 2*HD] fp32 accumulator in VMEM:
        # halve the source page above 512 channels to stay inside the 16 MB
        # scoped limit (measured: page=1024 at 1024ch overflows by 1 MB)
        default_page = 1024 if self.num_channels <= 512 else 512
        mapper_block = tuple(
            self.config.get("paged_mapper_block", (256, default_page, 128))
        )
        # fused backward: the kv-grad reduction recomputes attention per
        # page-sorted visit instead of reading a dkv buffer written by pass 1
        # -- removes the [num_flat, 2HD] HBM transient (the n320 decoder
        # memory ceiling; docs/design.md §6)
        fused_bwd = bool(self.config.get("paged_fused_bwd", False))
        _mfb = self.config.get("paged_mapper_fused_bwd")  # None = inherit
        mapper_fused_bwd = fused_bwd if _mfb is None else bool(_mfb)
        # auto heuristic (big grids): when neither mapper knob is explicit
        # and the estimated two-pass backward transient (num_flat x 3HD bf16,
        # padding ~1.7x) would exceed ~2 GB, switch that edge set to the
        # fused backward at small source pages -- measured at n320: train
        # 993 -> 941 ms, inference 476 -> 398 ms; no effect at o96 scale
        _mapper_auto = (
            "paged_mapper_block" not in self.config and _mfb is None
        )

        def _mapper_kwargs(sub):
            blk, fused = mapper_block, mapper_fused_bwd
            if inference and _mapper_auto:
                # serving: no backward exists, so small source pages always
                # win (fewer one-hot gather FLOPs; measured o160 317 -> 287,
                # n320 476 -> 398 ms)
                blk, fused = (256, 256, 128), False
            elif _mapper_auto:
                est = sub.edge_index.shape[1] * 1.7 * 3 * self.num_channels * 2
                if est > 2e9:
                    blk, fused = (256, 256, 128), True
            return dict(
                dtype=dtype, padded=padded,
                bucketed=bucketed and not paged_mappers,
                paged=paged_mappers, paged_block=blk, paged_fused_bwd=fused,
            )

        def _mapper_entry(sub, kw, base_ed):
            """Reuse a base EdgeData when only the (static) fused_bwd flag
            differs; rebuild only when the block sizes actually change."""
            if base_ed is None:
                return sub.edge_data(**kw)
            t = getattr(base_ed, "paged_tables", None)
            if not kw["paged"]:
                return base_ed  # padded tables never differ train vs serve
            if t is not None and (t.bd, t.page, t.r) == tuple(kw["paged_block"]):
                if bool(t.fused_bwd) == bool(kw["paged_fused_bwd"]):
                    return base_ed
                import dataclasses

                return base_ed.replace(
                    paged_tables=dataclasses.replace(
                        t, fused_bwd=bool(kw["paged_fused_bwd"])
                    )
                )
            return sub.edge_data(**kw)

        def _base(group, ds):
            return (base or {}).get(group, {}).get(ds)

        # model-parallel "edges" strategy: GraphTransformer mappers get their
        # own bipartite halo tables (src/dst node sets partitioned
        # independently, parallel/partition.py) so encoder/decoder attention
        # runs per shard inside the halo shard_map -- incl. the paged Pallas
        # kernel -- instead of falling back to GSPMD-sharded padded tables
        # (ref block.py:870-1032 mapper shard path)
        n_model_shards = int(self.config.get("num_model_shards", 1))
        halo_mappers = (
            self.shard_strategy == "edges"
            and n_model_shards > 1
            and bool(self.config.get("halo_mappers", True))
        )

        def _is_gt(block_cfg) -> bool:
            return str((block_cfg or {}).get("name", "")).startswith(
                "GraphTransformer"
            )

        def _halo_mapper_entry(sub, kw, base_ed):
            if base_ed is not None and base_ed.halo_tables is not None:
                return base_ed  # halo tables are identical train vs serve
            return sub.sharded_edge_data(
                n_model_shards, dtype=dtype,
                paged=self.attention_backend == "paged",
                paged_block=kw["paged_block"],
                overlap=bool(self.config.get("halo_overlap", True)),
            )

        enc_entry = (
            _halo_mapper_entry
            if halo_mappers and _is_gt(self.config.get("encoder"))
            else _mapper_entry
        )
        dec_entry = (
            _halo_mapper_entry
            if halo_mappers and _is_gt(self.config.get("decoder"))
            else _mapper_entry
        )

        return {
            "node_features": (
                base["node_features"] if base is not None else {
                    name: jnp.asarray(feat, dtype=dtype)
                    for name, feat in self.graph.node_features.items()
                }
            ),
            "encoder": {
                ds: enc_entry(sub, _mapper_kwargs(sub), _base("encoder", ds))
                for ds, sub in self.graph.encoder.items()
            },
            # k_multiple=8 keeps the [n, k, HD] reshapes around the processor's
            # k-reductions tile-aligned (free); the reshape retile tax runs
            # 16 layers x fwd+bwd per step there, while encoder/decoder run
            # once and prefer exact-k's smaller gather volume
            "processor": (
                base["processor"] if base is not None else (
                    self.graph.processor.sharded_edge_data(
                        int(self.config.get("num_model_shards", 1)), dtype=dtype,
                        # the paged kernel runs per shard INSIDE the halo
                        # shard_map (parallel/halo.py shard_paged_tables)
                        paged=self.attention_backend == "paged",
                        paged_block=paged_block,
                        overlap=bool(self.config.get("halo_overlap", True)),
                    )
                    if self.shard_strategy == "edges"
                    and int(self.config.get("num_model_shards", 1)) > 1
                    else self.graph.processor.edge_data(
                        dtype=dtype, padded=padded,
                        bucketed=bucketed and not paged,
                        k_multiple=8, paged=paged, paged_block=paged_block,
                        paged_fused_bwd=fused_bwd,
                    )
                )
            ),
            "decoder": {
                ds: dec_entry(sub, _mapper_kwargs(sub), _base("decoder", ds))
                for ds, sub in self.graph.decoder.items()
            },
        }

    @property
    def fcstep_input(self) -> bool:
        """Append a constant forecast-step channel to the encoder input
        (the ensemble model's reference behaviour,
        ens_encoder_processor_decoder.py:70-104: +1 input channel carrying
        the rollout step index).  Off for the base model."""
        return False

    @nn.compact
    def __call__(
        self,
        x: Dict[str, jnp.ndarray],  # per dataset [B, T, E, G, V_model_in]
        graph_inputs: Optional[Dict] = None,
        cond: Optional[jnp.ndarray] = None,
        fcstep: int = 0,
    ) -> Dict[str, jnp.ndarray]:
        graph = self.graph
        hidden = graph.hidden_name
        trainable_cfg = self.config.get("trainable_parameters", {}) or {}
        dataset_names = sorted(x.keys())
        if graph_inputs is None:  # constants fallback (slow compiles; tests only)
            graph_inputs = self.build_graph_inputs()

        some = x[dataset_names[0]]
        batch, n_time, ens = some.shape[0], some.shape[1], some.shape[2]
        assert n_time == self.n_step_input, (
            f"Expected {self.n_step_input} input steps, got {n_time}"
        )
        bflat = batch * ens
        compute_dtype = some.dtype

        # hidden latent = hidden node attributes, broadcast over flat batch
        hidden_attrs = TrainableNodeAttributes(
            num_nodes=graph.num_nodes[hidden],
            trainable_size=int(trainable_cfg.get(hidden, 0)),
            name=f"node_attributes_{hidden}",
        )(graph_inputs["node_features"][hidden].astype(compute_dtype))
        x_hidden_latent = jnp.broadcast_to(
            hidden_attrs[None], (bflat,) + hidden_attrs.shape
        )

        x_skip = {}
        x_data_latent = {}
        latents = []
        for ds in dataset_names:
            idx = self.data_indices[ds]
            xd = x[ds]
            # residual skip state (most recent step by default); learnable
            # residuals (ScalarOrnstein) are flax submodules created here in
            # compact scope, named residual_<ds>
            residual = build_residual(
                self.config.get("residual"), graph=self.graph.source_graph, dataset=ds,
                data_indices=idx,
                statistics=(self.config.get("statistics") or {}).get(ds),
            )
            x_skip[ds] = residual(xd, n_step_output=self.n_step_output)

            node_attrs = TrainableNodeAttributes(
                num_nodes=graph.num_nodes[ds],
                trainable_size=int(trainable_cfg.get(ds, 0)),
                name=f"node_attributes_{ds}",
            )(graph_inputs["node_features"][ds].astype(compute_dtype))

            # [B,T,E,G,V] -> [(B E), G, (T V)]
            flat = jnp.transpose(xd, (0, 2, 3, 1, 4)).reshape(
                bflat, xd.shape[3], n_time * xd.shape[4]
            )
            latent_parts = [
                flat,
                jnp.broadcast_to(node_attrs[None], (bflat,) + node_attrs.shape),
            ]
            if self.fcstep_input:
                # ref order: [x, node attrs, fcstep], CLAMPED to min(1, step)
                # (ens_encoder_processor_decoder.py:199 -- the channel only
                # distinguishes the analysis-driven first step from rollout)
                latent_parts.append(
                    jnp.full(
                        (bflat, xd.shape[3], 1),
                        float(min(1, fcstep)),
                        dtype=compute_dtype,
                    )
                )
            x_latent_in = jnp.concatenate(latent_parts, axis=-1)

            enc_edges = graph_inputs["encoder"][ds]
            enc_provider = (self.config["encoder"] or {}).get("edge_provider")
            if enc_provider and enc_provider.get("name") == "DynamicKNN":
                enc_edges = _dynamic_edge_data(
                    enc_provider,
                    graph_inputs["node_features"][ds],
                    graph_inputs["node_features"][hidden],
                )
            x_data_out, x_latent = _build_encoder(
                self.config["encoder"], self.num_channels, self.attention_backend
            )(
                (x_latent_in, x_hidden_latent),
                enc_edges,
            )
            x_data_latent[ds] = x_data_out
            latents.append(x_latent)

        x_latent = sum(latents)
        x_latent = self._maybe_shard(x_latent, (None, "model", None))

        # ensemble noise hook (base model: identity, no conditioning)
        x_latent, noise_cond = self._noise_hook(x_latent)
        if cond is None:
            cond = noise_cond

        x_latent_proc = _build_processor(
            self.config["processor"], self.num_channels, self.attention_backend,
            shard_strategy=self.shard_strategy,
        )(
            x_latent,
            graph_inputs["processor"],
            cond,
        )

        if self.latent_skip:
            x_latent_proc = x_latent_proc + x_latent
        x_latent_proc = self._maybe_shard(x_latent_proc, (None, "model", None))

        out = {}
        for ds in dataset_names:
            idx = self.data_indices[ds]
            dec_edges = graph_inputs["decoder"][ds]
            dec_provider = (self.config["decoder"] or {}).get("edge_provider")
            if dec_provider and dec_provider.get("name") == "DynamicKNN":
                dec_edges = _dynamic_edge_data(
                    dec_provider,
                    graph_inputs["node_features"][hidden],
                    graph_inputs["node_features"][ds],
                )
            x_out = _build_decoder(
                self.config["decoder"],
                self.num_channels,
                self.output_dim(ds),
                self.attention_backend,
            )(
                (x_latent_proc, x_data_latent[ds]),
                dec_edges,
            )
            # [(B E), G, (T V)] -> [B, T, E, G, V]
            n_grid = x_out.shape[1]
            n_vars = idx.num_model_output_vars
            x_out = x_out.reshape(batch, ens, n_grid, self.n_step_output, n_vars)
            x_out = jnp.transpose(x_out, (0, 3, 1, 2, 4))

            # residual on prognostic variables (ref :131-163) -- scatter-free:
            # per output var, gather the matching input var and mask the add
            import numpy as np

            prog_out = idx.model.output.prognostic
            prog_in = idx.model.input.prognostic
            n_out_vars = idx.num_model_output_vars
            add_mask = np.zeros(n_out_vars, dtype=bool)
            skip_gather = np.zeros(n_out_vars, dtype=np.int32)
            add_mask[prog_out] = True
            skip_gather[prog_out] = prog_in
            x_out = x_out + jnp.where(
                jnp.asarray(add_mask),
                jnp.take(x_skip[ds], jnp.asarray(skip_gather), axis=-1),
                0.0,
            )

            for bounding in build_boundings(
                self.config.get("bounding"), idx.model.output.name_to_index
            ):
                x_out = bounding(x_out)
            out[ds] = x_out
        return out


@model_registry.register("AnemoiModelAutoEncoder")
class AnemoiModelAutoEncoder(AnemoiModelEncProcDec):
    """Encoder-decoder without autoregressive residual: the model maps the
    input state to a reconstruction/diagnostic output (ref models/autoencoder.py).
    Configure with residual: {name: NoResidualConnection} and a pointwise or
    shallow processor."""


@model_registry.register("AnemoiEnsModelEncProcDec")
class AnemoiEnsModelEncProcDec(AnemoiModelEncProcDec):
    """Ensemble model: per-member noise injected between encoder and processor
    (ref models/ens_encoder_processor_decoder.py:35, noise at :60,252-269).

    Each ensemble member (dim 2 of the input) runs through the same weights
    with an independent noise draw; with `NoiseConditioning` the processor
    blocks must be conditional (set processor.conditional: true)."""

    @property
    def fcstep_input(self) -> bool:
        # the reference always carries the forecast-step channel
        # (ens_encoder_processor_decoder.py:70 `+ 1  # for fcstep`);
        # fcstep_input: false restores the pre-r5 leaner input
        return bool(self.config.get("fcstep_input", True))

    def input_dim(self, ds: str) -> int:
        return super().input_dim(ds) + (1 if self.fcstep_input else 0)

    def _noise_hook(self, x_latent: jnp.ndarray):
        from anemoi_tpu.models.layers.ensemble import build_noise_injector

        injector = build_noise_injector(
            self.config.get("noise_injector"), self.num_channels
        )
        return injector(x_latent)

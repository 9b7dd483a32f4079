"""Hierarchical encoder-processor-decoder.

Equivalent of /root/reference/models/src/anemoi/models/models/hierarchical.py
(AnemoiModelEncProcDecHierarchical, 473 LoC) and
hierarchical_autoencoder.py: a V-cycle over multiple hidden mesh levels

    data -> h1 -> h2 -> ... -> hL -> ... -> h2 -> h1 -> data

with per-level processors on the way down and up, downscale/upscale mappers
between levels, and skip connections between the down and up states.

Graph requirements: node sets ``hidden_1..hidden_L`` plus edge sets
(data->hidden_1), (hidden_i->hidden_{i+1}), (hidden_{i+1}->hidden_i),
(hidden_i->hidden_i) for the processed levels, and (hidden_1->data).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import flax.linen as nn
import jax.numpy as jnp

from anemoi_tpu.models import model_registry
from anemoi_tpu.models.encoder_processor_decoder import (
    AnemoiModelEncProcDec,
    _build_decoder,
    _build_encoder,
    _build_processor,
)
from anemoi_tpu.models.layers.embed import TrainableNodeAttributes


@model_registry.register("AnemoiModelEncProcDecHierarchical")
class AnemoiModelEncProcDecHierarchical(AnemoiModelEncProcDec):
    """Multi-level V-cycle model."""

    @property
    def hidden_names(self) -> List[str]:
        names = self.config.get("hidden_names")
        if names:
            return list(names)
        # infer hidden_1..hidden_L from the graph
        ns = sorted(
            (n for n in self.graph.num_nodes if n.startswith("hidden")),
            key=lambda s: int(s.split("_")[1]) if "_" in s else 1,
        )
        return ns

    @property
    def level_process(self) -> bool:
        # reference key: model.enable_hierarchical_level_processing
        # (hierarchical.py:62); `level_process` kept as the short alias
        if "enable_hierarchical_level_processing" in self.config:
            return bool(self.config["enable_hierarchical_level_processing"])
        return bool(self.config.get("level_process", True))

    @property
    def level_channel_ratio(self) -> int:
        """Per-level channel growth: level i runs at
        ``num_channels * ratio**i``.  The reference architecture hard-codes
        ratio 2 (hierarchical.py:37 ``hidden_dims = C * 2**i``); the repo
        default is 1 (constant width -- cheaper at depth, the benched
        V-cycle configuration)."""
        return int(self.config.get("level_channel_ratio", 1))

    def level_dims(self, levels) -> list:
        r = self.level_channel_ratio
        return [self.num_channels * (r ** i) for i in range(len(levels))]

    @property
    def level_process_num_layers(self):
        """Layer count for the per-level (non-deepest) processors
        (reference key model.level_process_num_layers); None = same as the
        main processor's num_layers."""
        v = self.config.get("level_process_num_layers")
        return None if v is None else int(v)

    def build_graph_inputs(self, dtype=jnp.float32, inference: bool = False,
                           base: Optional[Dict] = None) -> Dict:
        """All hierarchy sub-graphs as device arrays.

        ``base``: training tables to share with at inference -- node features
        and per-level processor tables are always identical; mapper-class
        groups (encoder/decoder/down/up) are reused unless the serving page
        size differs (see encoder_processor_decoder.build_graph_inputs)."""
        from anemoi_tpu.models.graph import extract_subgraph

        padded = self.attention_backend != "segment"
        # paged Pallas kernel on every hierarchy sub-graph (single-shard path;
        # see encoder_processor_decoder.build_graph_inputs)
        paged = self.attention_backend == "paged" and self.shard_strategy == "none"
        pb = tuple(self.config.get("paged_block", (256, 256, 128)))
        default_page = 1024 if self.num_channels <= 512 else 512
        if inference and "paged_mapper_block" not in self.config:
            default_page = 256  # forward-only: small pages always win
        mb = tuple(
            self.config.get("paged_mapper_block", (256, default_page, 128))
        )
        fb = bool(self.config.get("paged_fused_bwd", False))
        _mfb = self.config.get("paged_mapper_fused_bwd")  # None = inherit
        mfb = fb if _mfb is None else bool(_mfb)
        g = self.graph
        levels = self.hidden_names

        # "edges" strategy: every hierarchy sub-graph gets its own halo
        # tables (level processors: square partition; enc/dec/down/up
        # mappers: bipartite partition), exactly like the flat model's
        # build_graph_inputs — the paged kernel then runs per shard inside
        # each halo shard_map
        n_model_shards = int(self.config.get("num_model_shards", 1))
        halo = (
            self.shard_strategy == "edges"
            and n_model_shards > 1
            and bool(self.config.get("halo_mappers", True))
        )
        overlap = bool(self.config.get("halo_overlap", True))
        paged_any = self.attention_backend == "paged"

        def _is_gt(block_cfg) -> bool:
            return str((block_cfg or {}).get("name", "")).startswith(
                "GraphTransformer"
            )

        def _mapper_entry(sub, base_ed, gt=True):
            if halo and gt:
                if base_ed is not None and base_ed.halo_tables is not None:
                    return base_ed  # halo tables identical train vs serve
                return sub.sharded_edge_data(
                    n_model_shards, dtype=dtype, paged=paged_any,
                    paged_block=mb, overlap=overlap,
                )
            if base_ed is None:
                return sub.edge_data(dtype=dtype, padded=padded, paged=paged,
                                     paged_block=mb, paged_fused_bwd=mfb)
            t = getattr(base_ed, "paged_tables", None)
            if not paged:
                return base_ed
            if t is not None and (t.bd, t.page, t.r) == tuple(mb):
                if bool(t.fused_bwd) == bool(mfb):
                    return base_ed
                import dataclasses

                return base_ed.replace(
                    paged_tables=dataclasses.replace(t, fused_bwd=bool(mfb))
                )
            return sub.edge_data(dtype=dtype, padded=padded, paged=paged,
                                 paged_block=mb, paged_fused_bwd=mfb)

        def _base(group, ds):
            return (base or {}).get(group, {}).get(ds)

        out = {
            "node_features": (
                base["node_features"] if base is not None else {
                    name: jnp.asarray(feat, dtype=dtype)
                    for name, feat in g.node_features.items()
                }
            ),
            "encoder": {
                ds: _mapper_entry(sub, _base("encoder", ds),
                                  gt=_is_gt(self.config.get("encoder")))
                for ds, sub in g.encoder.items()
            },
            "decoder": {
                ds: _mapper_entry(sub, _base("decoder", ds),
                                  gt=_is_gt(self.config.get("decoder")))
                for ds, sub in g.decoder.items()
            },
            "down": {},
            "up": {},
            "level": {},
        }
        source = g.source_graph
        for i, name in enumerate(levels):
            if (name, name) in source:
                lvl_sub = None if base is not None else extract_subgraph(
                    source, name, name,
                    self.config["processor"].get("sub_graph_edge_attributes"),
                )
                out["level"][name] = (
                    _base("level", name) if base is not None else (
                        lvl_sub.sharded_edge_data(
                            n_model_shards, dtype=dtype, paged=paged_any,
                            paged_block=pb, overlap=overlap,
                        )
                        if halo else
                        lvl_sub.edge_data(dtype=dtype, padded=padded,
                                          paged=paged, paged_block=pb,
                                          paged_fused_bwd=fb)
                    )
                )
            if i + 1 < len(levels):
                nxt = levels[i + 1]
                out["down"][name] = _mapper_entry(
                    extract_subgraph(
                        source, name, nxt,
                        self.config["encoder"].get("sub_graph_edge_attributes"),
                    ),
                    _base("down", name),
                    gt=_is_gt(self.config.get("encoder")),
                )
                out["up"][nxt] = _mapper_entry(
                    extract_subgraph(
                        source, nxt, name,
                        self.config["decoder"].get("sub_graph_edge_attributes"),
                    ),
                    _base("up", nxt),
                    gt=_is_gt(self.config.get("decoder")),
                )
        return out

    @nn.compact
    def __call__(
        self,
        x: Dict[str, jnp.ndarray],
        graph_inputs: Optional[Dict] = None,
        cond: Optional[jnp.ndarray] = None,
    ) -> Dict[str, jnp.ndarray]:
        from anemoi_tpu.models.layers.bounding import build_boundings
        from anemoi_tpu.models.layers.residual import build_residual

        graph = self.graph
        levels = self.hidden_names
        trainable_cfg = self.config.get("trainable_parameters", {}) or {}
        dataset_names = sorted(x.keys())
        if graph_inputs is None:
            graph_inputs = self.build_graph_inputs()

        some = x[dataset_names[0]]
        batch, n_time, ens = some.shape[0], some.shape[1], some.shape[2]
        bflat = batch * ens
        compute_dtype = some.dtype
        dims = self.level_dims(levels)
        deepest = len(levels) - 1

        def node_attrs(name):
            attrs = TrainableNodeAttributes(
                num_nodes=graph.num_nodes[name],
                trainable_size=int(trainable_cfg.get(name, 0)),
                name=f"node_attributes_{name}",
            )(graph_inputs["node_features"][name].astype(compute_dtype))
            return jnp.broadcast_to(attrs[None], (bflat,) + attrs.shape)

        def level_proc_cfg(i):
            # non-deepest levels: reference model.level_process_num_layers
            # (hierarchical.py:85); the deepest level runs the MAIN processor
            # with the full processor.num_layers
            cfg = self.config["processor"]
            n = self.level_process_num_layers
            if i != deepest and n is not None:
                cfg = {**cfg, "num_layers": n}
            return cfg

        # ---- encode data -> h1 ---------------------------------------
        h1 = levels[0]
        x_h = node_attrs(h1)
        x_skip = {}
        x_data_latent = {}
        latents = []
        for ds in dataset_names:
            idx = self.data_indices[ds]
            xd = x[ds]
            residual = build_residual(
                self.config.get("residual"), graph=self.graph.source_graph, dataset=ds
            )
            x_skip[ds] = residual(xd, n_step_output=self.n_step_output)
            attrs = node_attrs(ds)
            flat = jnp.transpose(xd, (0, 2, 3, 1, 4)).reshape(
                bflat, xd.shape[3], n_time * xd.shape[4]
            )
            x_in = jnp.concatenate([flat, attrs], axis=-1)
            x_data_out, x_latent = _build_encoder(
                self.config["encoder"], dims[0], self.attention_backend,
                module_name=f"encoder_{ds}",
            )((x_in, x_h), graph_inputs["encoder"][ds])
            x_data_latent[ds] = x_data_out
            latents.append(x_latent)
        state = sum(latents)

        # ---- V-cycle down --------------------------------------------
        # reference structure (hierarchical.py:292-380): per-level "down"
        # processor, downscale mapper to the next level, MAIN processor at the
        # deepest level with an optional latent skip (model.latent_skip)
        down_states = {}
        for i, name in enumerate(levels):
            if self.level_process and name in graph_inputs["level"]:
                proc = _build_processor(
                    level_proc_cfg(i), dims[i],
                    self.attention_backend, shard_strategy=self.shard_strategy,
                    module_name=("processor" if i == deepest
                                 else f"proc_down_{name}"),
                )(state, graph_inputs["level"][name], cond)
                if i == deepest and self.latent_skip:
                    proc = proc + state
                state = proc
            down_states[name] = state
            if i + 1 < len(levels):
                nxt = levels[i + 1]
                _, state = _build_encoder(
                    self.config["encoder"], dims[i + 1], self.attention_backend,
                    module_name=f"down_{name}",
                )((state, node_attrs(nxt)), graph_inputs["down"][name])

        # ---- V-cycle up ----------------------------------------------
        for i in range(len(levels) - 2, -1, -1):
            name = levels[i]
            nxt = levels[i + 1]
            state = _build_decoder(
                self.config["up_mapper"] if "up_mapper" in self.config else self.config["decoder"],
                dims[i + 1],
                dims[i],
                self.attention_backend,
                module_name=f"up_{nxt}",
            )((state, down_states[name]), graph_inputs["up"][nxt])
            state = state + down_states[name]  # skip connection across the V
            if self.level_process and name in graph_inputs["level"]:
                state = _build_processor(
                    level_proc_cfg(i), dims[i],
                    self.attention_backend, shard_strategy=self.shard_strategy,
                    module_name=f"proc_up_{name}",
                )(state, graph_inputs["level"][name], cond)

        # ---- decode h1 -> data ---------------------------------------
        out = {}
        import numpy as np

        for ds in dataset_names:
            idx = self.data_indices[ds]
            x_out = _build_decoder(
                self.config["decoder"],
                dims[0],
                self.output_dim(ds),
                self.attention_backend,
                module_name=f"decoder_{ds}",
            )((state, x_data_latent[ds]), graph_inputs["decoder"][ds])
            n_grid = x_out.shape[1]
            n_vars = idx.num_model_output_vars
            x_out = x_out.reshape(batch, ens, n_grid, self.n_step_output, n_vars)
            x_out = jnp.transpose(x_out, (0, 3, 1, 2, 4))
            prog_out = idx.model.output.prognostic
            prog_in = idx.model.input.prognostic
            add_mask = np.zeros(n_vars, dtype=bool)
            skip_gather = np.zeros(n_vars, dtype=np.int32)
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


@model_registry.register("AnemoiModelHierarchicalAutoEncoder")
class AnemoiModelHierarchicalAutoEncoder(AnemoiModelEncProcDecHierarchical):
    """Hierarchical autoencoder: configure residual NoResidualConnection
    (ref models/hierarchical_autoencoder.py)."""

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
)
from anemoi_tpu.models.layers.processor import (
    GNNProcessor,
    GraphTransformerProcessor,
    PointWiseMLPProcessor,
)
from anemoi_tpu.models.layers.residual import build_residual

ENCODERS = {
    "GraphTransformerForwardMapper": GraphTransformerForwardMapper,
    "GNNForwardMapper": GNNForwardMapper,
}
DECODERS = {
    "GraphTransformerBackwardMapper": GraphTransformerBackwardMapper,
    "GNNBackwardMapper": GNNBackwardMapper,
}
PROCESSORS = {
    "GraphTransformerProcessor": GraphTransformerProcessor,
    "GNNProcessor": GNNProcessor,
    "PointWiseMLPProcessor": PointWiseMLPProcessor,
}


def _build_encoder(cfg: dict, hidden_dim: int, backend: str) -> nn.Module:
    cfg = dict(cfg)
    cls = ENCODERS[cfg.pop("name", "GraphTransformerForwardMapper")]
    cfg.pop("sub_graph_edge_attributes", None)
    trainable = cfg.pop("trainable_size", 0)
    if cls is GraphTransformerForwardMapper:
        return cls(hidden_dim=hidden_dim, edge_trainable_size=trainable, backend=backend, **cfg)
    return cls(hidden_dim=hidden_dim, edge_trainable_size=trainable, **cfg)


def _build_decoder(cfg: dict, hidden_dim: int, out_channels: int, backend: str) -> nn.Module:
    cfg = dict(cfg)
    cls = DECODERS[cfg.pop("name", "GraphTransformerBackwardMapper")]
    cfg.pop("sub_graph_edge_attributes", None)
    trainable = cfg.pop("trainable_size", 0)
    if cls is GraphTransformerBackwardMapper:
        return cls(
            hidden_dim=hidden_dim,
            out_channels_dst=out_channels,
            edge_trainable_size=trainable,
            backend=backend,
            **cfg,
        )
    return cls(
        hidden_dim=hidden_dim, out_channels_dst=out_channels, edge_trainable_size=trainable, **cfg
    )


def _build_processor(cfg: dict, num_channels: int, backend: str) -> nn.Module:
    cfg = dict(cfg)
    cls = PROCESSORS[cfg.pop("name", "GraphTransformerProcessor")]
    cfg.pop("sub_graph_edge_attributes", None)
    trainable = cfg.pop("trainable_size", 0)
    if cls is GraphTransformerProcessor:
        return cls(num_channels=num_channels, edge_trainable_size=trainable, backend=backend, **cfg)
    if cls is GNNProcessor:
        return cls(num_channels=num_channels, edge_trainable_size=trainable, **cfg)
    return cls(num_channels=num_channels, **cfg)


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
        return str(self.config.get("graph_attention_backend", "segment"))

    def input_dim(self, ds: str) -> int:
        trainable = self.config.get("trainable_parameters", {}) or {}
        return (
            self.n_step_input * self.data_indices[ds].num_model_input_vars
            + self.graph.node_features[ds].shape[1]
            + int(trainable.get(ds, 0))
        )

    def output_dim(self, ds: str) -> int:
        return self.n_step_output * self.data_indices[ds].num_model_output_vars

    @nn.compact
    def __call__(
        self,
        x: Dict[str, jnp.ndarray],  # per dataset [B, T, E, G, V_model_in]
        cond: Optional[jnp.ndarray] = None,
    ) -> Dict[str, jnp.ndarray]:
        graph = self.graph
        hidden = graph.hidden_name
        trainable_cfg = self.config.get("trainable_parameters", {}) or {}
        dataset_names = sorted(x.keys())

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
        )(jnp.asarray(graph.node_features[hidden], dtype=compute_dtype))
        x_hidden_latent = jnp.broadcast_to(
            hidden_attrs[None], (bflat,) + hidden_attrs.shape
        )

        x_skip = {}
        x_data_latent = {}
        latents = []
        for ds in dataset_names:
            idx = self.data_indices[ds]
            xd = x[ds]
            # residual skip state (most recent step by default)
            residual = build_residual(self.config.get("residual"))
            x_skip[ds] = residual(xd, n_step_output=self.n_step_output)

            node_attrs = TrainableNodeAttributes(
                num_nodes=graph.num_nodes[ds],
                trainable_size=int(trainable_cfg.get(ds, 0)),
                name=f"node_attributes_{ds}",
            )(jnp.asarray(graph.node_features[ds], dtype=compute_dtype))

            # [B,T,E,G,V] -> [(B E), G, (T V)]
            flat = jnp.transpose(xd, (0, 2, 3, 1, 4)).reshape(
                bflat, xd.shape[3], n_time * xd.shape[4]
            )
            x_latent_in = jnp.concatenate(
                [flat, jnp.broadcast_to(node_attrs[None], (bflat,) + node_attrs.shape)],
                axis=-1,
            )

            sub = graph.encoder[ds]
            x_data_out, x_latent = _build_encoder(
                self.config["encoder"], self.num_channels, self.attention_backend
            )(
                (x_latent_in, x_hidden_latent),
                jnp.asarray(sub.edge_attr, dtype=compute_dtype),
                jnp.asarray(sub.edge_index),
            )
            x_data_latent[ds] = x_data_out
            latents.append(x_latent)

        x_latent = sum(latents)

        sub = graph.processor
        x_latent_proc = _build_processor(
            self.config["processor"], self.num_channels, self.attention_backend
        )(
            x_latent,
            jnp.asarray(sub.edge_attr, dtype=compute_dtype),
            jnp.asarray(sub.edge_index),
            cond,
        )

        if self.latent_skip:
            x_latent_proc = x_latent_proc + x_latent

        out = {}
        for ds in dataset_names:
            idx = self.data_indices[ds]
            sub = graph.decoder[ds]
            x_out = _build_decoder(
                self.config["decoder"],
                self.num_channels,
                self.output_dim(ds),
                self.attention_backend,
            )(
                (x_latent_proc, x_data_latent[ds]),
                jnp.asarray(sub.edge_attr, dtype=compute_dtype),
                jnp.asarray(sub.edge_index),
            )
            # [(B E), G, (T V)] -> [B, T, E, G, V]
            n_grid = x_out.shape[1]
            n_vars = idx.num_model_output_vars
            x_out = x_out.reshape(batch, ens, n_grid, self.n_step_output, n_vars)
            x_out = jnp.transpose(x_out, (0, 3, 1, 2, 4))

            # residual on prognostic variables (ref :131-163)
            prog_out = jnp.asarray(idx.model.output.prognostic)
            prog_in = jnp.asarray(idx.model.input.prognostic)
            x_out = x_out.at[..., prog_out].add(x_skip[ds][..., prog_in])

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

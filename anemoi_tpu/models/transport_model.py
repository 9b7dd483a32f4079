"""Transport (diffusion / flow) encoder-processor-decoder.

Equivalent of /root/reference/models/src/anemoi/models/models/transport_encoder_processor_decoder.py
(AnemoiTransportModelEncProcDec, AnemoiTransportTendModelEncProcDec):
the network learns a denoiser (EDM) or velocity field (stochastic interpolant)
for the next state, conditioned on the input window.

Architecture: the (scaled) noised target is concatenated to the input-window
features at the encoder; the noise level / time enters as a Fourier embedding
conditioning every ConditionalLayerNorm in the processor.  The EDM skip/out
combination lives in the objective (transport/objectives.py), so this module
returns the raw network output F.
"""

from __future__ import annotations

from typing import Dict, Optional

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
from anemoi_tpu.models.transport.objectives import TIME_EMBEDDINGS


@model_registry.register("AnemoiTransportModelEncProcDec")
class AnemoiTransportModelEncProcDec(AnemoiModelEncProcDec):
    """Denoiser / velocity network over the grid->mesh->grid architecture."""

    @property
    def noise_embed_dim(self) -> int:
        return int(self.config.get("noise_embed_dim", 16))

    @property
    def noise_channels(self):
        """Reference-compat conditioning width (ref transport config
        model.transport.noise_channels, default 32 there): when set, the
        noise embedding runs at this width and is projected to
        ``noise_cond_dim`` by the two-layer SiLU ``noise_cond_mlp``
        (transport_encoder_processor_decoder.py:93-98), and the MAPPERS are
        noise-conditioned too (the reference wires ConditionalLayerNorm
        through every component's layer_kernels).  None (default) keeps the
        leaner legacy behaviour: direct embedding, processor-only
        conditioning."""
        v = self.config.get("noise_channels")
        return None if v is None else int(v)

    @property
    def noise_cond_dim(self) -> int:
        v = self.config.get("noise_cond_dim")
        return self.noise_embed_dim if v is None else int(v)

    def input_dim(self, ds: str) -> int:
        trainable = self.config.get("trainable_parameters", {}) or {}
        return (
            self.n_step_input * self.data_indices[ds].num_model_input_vars
            + self.n_step_output * self.data_indices[ds].num_model_output_vars
            + self.graph.node_features[ds].shape[1]
            + int(trainable.get(ds, 0))
        )

    @nn.compact
    def __call__(  # noqa: C901
        self,
        x: Dict[str, jnp.ndarray],  # conditioning window [B, T_in, E, G, V_in]
        y_noised: Dict[str, jnp.ndarray] = None,  # [B, T_out, E, G, V_out] (c_in-scaled)
        noise_level: jnp.ndarray = None,  # [B, E] (c_noise or time t)
        graph_inputs: Optional[Dict] = None,
    ) -> Dict[str, jnp.ndarray]:
        graph = self.graph
        hidden = graph.hidden_name
        trainable_cfg = self.config.get("trainable_parameters", {}) or {}
        dataset_names = sorted(x.keys())
        if graph_inputs is None:
            graph_inputs = self.build_graph_inputs()
        assert y_noised is not None and noise_level is not None

        some = x[dataset_names[0]]
        batch, n_time, ens = some.shape[0], some.shape[1], some.shape[2]
        bflat = batch * ens
        compute_dtype = some.dtype

        # noise conditioning vector, broadcast per node later; the embedding
        # family is configurable (ref layers/diffusion.py: RandomFourier /
        # Sinusoidal; default matches the previous fourier behaviour)
        embed_fn = TIME_EMBEDDINGS[self.config.get("noise_embedding", "fourier")]
        if self.noise_channels is not None:
            # reference path: wide embedding -> Linear/SiLU/Linear cond MLP
            # (ref _embed_noise_conditioning + _create_noise_conditioning_mlp)
            kw = {}
            if self.config.get("noise_max_period") is not None:
                kw["max_period"] = float(self.config["noise_max_period"])
            emb = embed_fn(
                noise_level.reshape(bflat), self.noise_channels, **kw
            ).astype(compute_dtype)
            h = nn.Dense(self.noise_channels, name="noise_cond_mlp_linear1")(emb)
            cond_vec = nn.Dense(self.noise_cond_dim, name="noise_cond_mlp_linear2")(
                nn.silu(h)
            )
        else:
            cond_vec = embed_fn(
                noise_level.reshape(bflat), self.noise_embed_dim
            ).astype(compute_dtype)  # [bflat, emb]
        conditional_mappers = bool(
            self.config.get("conditional_mappers", self.noise_channels is not None)
        )

        hidden_attrs = TrainableNodeAttributes(
            num_nodes=graph.num_nodes[hidden],
            trainable_size=int(trainable_cfg.get(hidden, 0)),
            name=f"node_attributes_{hidden}",
        )(graph_inputs["node_features"][hidden].astype(compute_dtype))
        x_hidden_latent = jnp.broadcast_to(
            hidden_attrs[None], (bflat,) + hidden_attrs.shape
        )
        cond_hidden = jnp.broadcast_to(
            cond_vec[:, None, :], (bflat, graph.num_nodes[hidden], cond_vec.shape[-1])
        )

        x_data_latent = {}
        cond_data_by_ds = {}
        latents = []
        for ds in dataset_names:
            node_attrs = TrainableNodeAttributes(
                num_nodes=graph.num_nodes[ds],
                trainable_size=int(trainable_cfg.get(ds, 0)),
                name=f"node_attributes_{ds}",
            )(graph_inputs["node_features"][ds].astype(compute_dtype))

            xd = x[ds]
            flat_x = jnp.transpose(xd, (0, 2, 3, 1, 4)).reshape(
                bflat, xd.shape[3], n_time * xd.shape[4]
            )
            yn = y_noised[ds]
            flat_y = jnp.transpose(yn, (0, 2, 3, 1, 4)).reshape(
                bflat, yn.shape[3], yn.shape[1] * yn.shape[4]
            )
            x_latent_in = jnp.concatenate(
                [flat_x, flat_y,
                 jnp.broadcast_to(node_attrs[None], (bflat,) + node_attrs.shape)],
                axis=-1,
            )

            cond_ds = None
            if conditional_mappers:
                cond_ds = jnp.broadcast_to(
                    cond_vec[:, None, :],
                    (bflat, graph.num_nodes[ds], cond_vec.shape[-1]),
                )
                cond_data_by_ds[ds] = cond_ds
            x_data_out, x_latent = _build_encoder(
                self.config["encoder"], self.num_channels, self.attention_backend
            )(
                (x_latent_in, x_hidden_latent), graph_inputs["encoder"][ds],
                cond=(cond_ds, cond_hidden) if conditional_mappers else None,
            )
            x_data_latent[ds] = x_data_out
            latents.append(x_latent)

        x_latent = sum(latents)
        x_latent = self._maybe_shard(x_latent, (None, "model", None))

        proc_cfg = dict(self.config["processor"])
        proc_cfg.setdefault("conditional", True)
        x_latent_proc = _build_processor(
            proc_cfg, self.num_channels, self.attention_backend
        )(x_latent, graph_inputs["processor"], cond_hidden)

        if self.latent_skip:
            x_latent_proc = x_latent_proc + x_latent

        out = {}
        for ds in dataset_names:
            idx = self.data_indices[ds]
            x_out = _build_decoder(
                self.config["decoder"],
                self.num_channels,
                self.output_dim(ds),
                self.attention_backend,
            )(
                (x_latent_proc, x_data_latent[ds]), graph_inputs["decoder"][ds],
                cond=(cond_hidden, cond_data_by_ds[ds])
                if conditional_mappers else None,
            )
            n_grid = x_out.shape[1]
            n_vars = idx.num_model_output_vars
            x_out = x_out.reshape(batch, ens, n_grid, self.n_step_output, n_vars)
            out[ds] = jnp.transpose(x_out, (0, 3, 1, 2, 4))
        return out


@model_registry.register("AnemoiTransportTendModelEncProcDec")
class AnemoiTransportTendModelEncProcDec(AnemoiTransportModelEncProcDec):
    """Tendency variant: the diffusion target is the state increment
    (ref transport_encoder_processor_decoder.py tendency flavour).  The
    training method computes tendency targets; the network is identical."""

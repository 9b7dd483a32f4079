"""Model interface: model + per-dataset pre/post processors + metadata.

Equivalent of /root/reference/models/src/anemoi/models/interface/__init__.py:24-255
(AnemoiModelInterface): owns the flax module and its parameters, the
preprocessing chains, and the prediction step used by evaluation/inference.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from anemoi_tpu.data_indices.collection import IndexCollection
from anemoi_tpu.models import model_registry
from anemoi_tpu.models.graph import ModelGraph, build_model_graph
from anemoi_tpu.preprocessing.processors import Processors, build_processors
from anemoi_tpu.preprocessing.remapper import Remapper
from anemoi_tpu.utils.seeding import context_key


class AnemoiModelInterface:
    """Wraps the flax model with pre/post-processing and index bookkeeping."""

    def __init__(
        self,
        *,
        config: dict,
        graph: "Graph or ModelGraph",
        data_indices: Dict[str, IndexCollection],
        statistics: Dict[str, Dict[str, np.ndarray]],
        metadata: Optional[dict] = None,
    ) -> None:
        self.config = config
        self.metadata = metadata or {}

        # A variable-EXPANDING Remapper (ref preprocessing/remapper.py:39)
        # rewrites the index collections and statistics BEFORE the model and
        # the rest of the processor chain are built, so everything downstream
        # lives in the remapped variable space.
        processors_cfg = list(config.get("data", {}).get("processors") or [])
        remap_cfg = next(
            (dict(c) for c in processors_cfg if c.get("name") == "Remapper"), None
        )
        self.remappers: Dict[str, "Remapper"] = {}
        if remap_cfg is not None:
            remap_cfg.pop("name")
            data_indices = dict(data_indices)
            statistics = dict(statistics)
            for ds in data_indices:
                rm = Remapper(data_indices[ds], remap_cfg.get("config", remap_cfg))
                self.remappers[ds] = rm
                data_indices[ds] = rm.data_indices
                statistics[ds] = rm.remap_statistics(statistics[ds])
            processors_cfg = [c for c in processors_cfg if c.get("name") != "Remapper"]
        self.data_indices = data_indices
        self.statistics = statistics

        model_cfg = dict(config["model"])
        # thread per-dataset statistics into the model config: learnable
        # residuals (ScalarOrnstein) auto-init theta from tendency statistics
        model_cfg.setdefault("statistics", statistics)
        hidden_name = "hidden"
        if model_cfg.get("hidden_names"):
            hidden_name = model_cfg["hidden_names"][0]
        elif isinstance(graph, ModelGraph):
            hidden_name = graph.hidden_name
        elif "hidden" not in graph.node_names():
            hiddens = sorted(n for n in graph.node_names() if n.startswith("hidden"))
            if hiddens:
                hidden_name = hiddens[0]
        if isinstance(graph, ModelGraph):
            self.model_graph = graph
        else:
            self.model_graph = build_model_graph(
                graph,
                hidden_name=hidden_name,
                dataset_names=sorted(data_indices.keys()),
                encoder_edge_attributes=model_cfg.get("encoder", {}).get(
                    "sub_graph_edge_attributes"
                ),
                processor_edge_attributes=model_cfg.get("processor", {}).get(
                    "sub_graph_edge_attributes"
                ),
                decoder_edge_attributes=model_cfg.get("decoder", {}).get(
                    "sub_graph_edge_attributes"
                ),
            )

        model_name = model_cfg.pop("name", "AnemoiModelEncProcDec")
        self.model = model_registry.get(model_name)(
            graph=self.model_graph, data_indices=data_indices, config=model_cfg
        )
        # device-side graph arrays, passed to every apply as ARGUMENTS (compile
        # time: constants inline into HLO and compile ~13x slower)
        self.graph_inputs = self.model.build_graph_inputs()

        self.pre_processors: Dict[str, Processors] = {}
        for ds, idx in data_indices.items():
            chain = build_processors(processors_cfg, idx, statistics[ds])
            if ds in self.remappers:
                # remapper first: transform expands raw data-space tensors;
                # inverses run in reverse order, so it converts back last.
                chain.processors.insert(0, self.remappers[ds])
            self.pre_processors[ds] = chain

    # ------------------------------------------------------------------
    def init_params(self, rng: Optional[jax.Array] = None, batch_size: int = 1) -> Any:
        """Initialise model parameters with a dummy batch.

        The init is jitted: one whole-graph XLA compile instead of hundreds of
        per-op eager dispatch compiles (critical on slow-compile hosts)."""
        if rng is None:
            rng = context_key("model-init")
        x = {}
        for ds, idx in self.data_indices.items():
            n_grid = self.model_graph.num_nodes[ds]
            x[ds] = jnp.zeros(
                (
                    batch_size,
                    self.model.n_step_input,
                    1,
                    n_grid,
                    idx.num_model_input_vars,
                ),
                dtype=jnp.float32,
            )
        rngs = {"params": rng, "noise": jax.random.fold_in(rng, 1)}
        if getattr(self.model, "is_transport", False) or "Transport" in type(
            self.model
        ).__name__:
            # transport models take the noised target + noise level too
            y = {
                ds: jnp.zeros(
                    x[ds].shape[:1]
                    + (self.model.n_step_output,)
                    + x[ds].shape[2:4]
                    + (idx.num_model_output_vars,),
                    dtype=jnp.float32,
                )
                for ds, idx in self.data_indices.items()
            }
            noise_level = jnp.zeros((batch_size, 1), dtype=jnp.float32)
            return jax.jit(self.model.init)(
                rngs, x, y, noise_level, self.graph_inputs
            )
        return jax.jit(self.model.init)(rngs, x, self.graph_inputs)

    def apply(
        self,
        params: Any,
        x: Dict[str, jnp.ndarray],
        cond=None,
        rng: Optional[jax.Array] = None,
        graph_inputs=None,
    ) -> Dict[str, jnp.ndarray]:
        """Forward pass routing the graph arrays in as arguments."""
        rngs = {"noise": rng} if rng is not None else {"noise": context_key("noise")}
        gi = self.graph_inputs if graph_inputs is None else graph_inputs
        return self.model.apply(params, x, gi, cond, rngs=rngs)

    @property
    def inference_graph_inputs(self):
        """Forward-only graph tables (small mapper source pages: no backward
        exists at serving time, so the gather-FLOP-optimal layout always wins
        -- measured n320 476 -> 398 ms, o160 317 -> 287 ms).  Built lazily so
        training-only runs never pay for it, and built AGAINST the training
        tables (``base=``): node_features, the processor, and any mapper whose
        page size doesn't change are shared, so the extra HBM is only the
        mappers that really get serving-specific tables."""
        gi = getattr(self, "_inference_graph_inputs", None)
        if gi is None:
            import inspect

            sig = inspect.signature(self.model.build_graph_inputs)
            if "inference" in sig.parameters:
                kw = {"inference": True}
                if "base" in sig.parameters:
                    kw["base"] = self.graph_inputs
                gi = self.model.build_graph_inputs(**kw)
            else:  # models without the inference variant
                gi = self.graph_inputs
            self._inference_graph_inputs = gi
        return gi

    # ------------------------------------------------------------------
    @property
    def inference_compute_dtype(self):
        """Serving precision (model.inference_precision, default bf16 -- the
        reference serves 16-mixed, config/model/graphtransformer.yaml).  The
        model derives its compute dtype from the input dtype, so casting
        params + normalised inputs switches the whole forward; pre/post
        processing stays fp32.  Measured n320: 397 -> ~250 ms."""
        prec = str(
            (self.config.get("model") or {}).get("inference_precision", "bf16")
        )
        if prec in ("bf16", "bfloat16", "16-mixed"):
            return jnp.bfloat16
        return None

    def cast_inference_params(self, params: Any) -> Any:
        dt = self.inference_compute_dtype
        if dt is None:
            return params
        return jax.tree_util.tree_map(
            lambda p: p.astype(dt) if p.dtype == jnp.float32 else p, params
        )

    def predict_step(
        self, params: Any, batch: Dict[str, jnp.ndarray], graph_inputs=None
    ) -> Dict[str, jnp.ndarray]:
        """Run one prediction from a raw (un-normalised, data-space) batch.

        batch[ds]: [B, T>=n_step_input, E, G, V_data]. Returns denormalised
        model-space output [B, n_step_output, E, G, V_model_out].
        (ref models/base.py:303-390 predict_step)

        ``graph_inputs``: pass ``interface.inference_graph_inputs`` explicitly
        when wrapping this in jax.jit so the tables enter as jit ARGUMENTS --
        the closed-over default inlines them as HLO constants (~13x slower
        axon compiles; the repo invariant).
        """
        dt = self.inference_compute_dtype
        x = {}
        aux = {}
        for ds, idx in self.data_indices.items():
            xb = batch[ds][:, : self.model.n_step_input]
            aux[ds] = self.pre_processors[ds].compute_aux(xb)
            xb = self.pre_processors[ds].transform(xb)
            xb = xb[..., jnp.asarray(idx.data.input.full)]
            x[ds] = xb.astype(dt) if dt is not None else xb
        y = self.apply(
            self.cast_inference_params(params), x,
            graph_inputs=(
                self.inference_graph_inputs if graph_inputs is None
                else graph_inputs
            ),
        )
        out = {}
        for ds, idx in self.data_indices.items():
            out[ds] = self.pre_processors[ds].inverse_transform(
                y[ds].astype(jnp.float32), aux=aux[ds]
            )
        return out

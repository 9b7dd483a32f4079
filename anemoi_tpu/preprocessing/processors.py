"""Processor chain: ordered pre/post-processing.

Equivalent of /root/reference/models/src/anemoi/models/preprocessing/__init__.py:150
(`Processors`): applies each processor's transform in order (forward) and the
inverse transforms in reverse order (inverse).  ``StepwiseProcessors`` (:210)
holds one chain per forecast lead time (possibly sparse).

Because JAX modules are stateless, the reference's cached-NaN-mask pattern
becomes explicit data flow: ``aux = chain.compute_aux(raw_batch)`` collects
every imputer's NaN bookkeeping; ``inverse_transform(y, aux=aux)`` re-inserts
NaNs; ``loss_mask(aux)`` is the imputer-coupled loss weight (ref
imputer.py:219-227 loss_mask_training)."""

from __future__ import annotations

from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from anemoi_tpu.data_indices.collection import IndexCollection
from anemoi_tpu.preprocessing.imputer import (
    BaseImputer,
    ConstantImputer,
    CopyImputer,
    DynamicConstantImputer,
    DynamicCopyImputer,
    DynamicInputImputer,
    InputImputer,
)
from anemoi_tpu.preprocessing.normalizer import InputNormalizer
from anemoi_tpu.preprocessing.postprocessor import (
    ConditionalNaNPostprocessor,
    ConditionalZeroPostprocessor,
    NormalizedReluPostprocessor,
    Postprocessor,
)
from anemoi_tpu.preprocessing.remapper import CosSinRemapper
from anemoi_tpu.utils.registry import Registry

processor_registry = Registry("preprocessor")
processor_registry.register("InputNormalizer")(InputNormalizer)
for _name, _cls in {
    "InputImputer": InputImputer,
    "ConstantImputer": ConstantImputer,
    "CopyImputer": CopyImputer,
    "DynamicInputImputer": DynamicInputImputer,
    "DynamicConstantImputer": DynamicConstantImputer,
    "DynamicCopyImputer": DynamicCopyImputer,
    "Postprocessor": Postprocessor,
    "NormalizedReluPostprocessor": NormalizedReluPostprocessor,
    "ConditionalZeroPostprocessor": ConditionalZeroPostprocessor,
    "ConditionalNaNPostprocessor": ConditionalNaNPostprocessor,
}.items():
    processor_registry.register(_name)(_cls)
processor_registry.register("CosSinRemapper")(
    lambda data_indices, statistics=None, **cfg: CosSinRemapper(data_indices, cfg.get("config"))
)


class Processors:
    def __init__(self, processors: List) -> None:
        self.processors = list(processors)

    def __call__(self, x: jnp.ndarray, in_place: bool = False) -> jnp.ndarray:
        return self.transform(x)

    def transform(self, x: jnp.ndarray) -> jnp.ndarray:
        for p in self.processors:
            x = p.transform(x)
        return x

    def inverse_transform(self, x: jnp.ndarray, aux=None) -> jnp.ndarray:
        for p in reversed(self.processors):
            try:
                x = p.inverse_transform(x, aux=aux)
            except TypeError:
                x = p.inverse_transform(x)
        return x

    # -- imputer NaN bookkeeping (functional replacement for the reference's
    #    cached masks; see module docstring) ------------------------------
    def compute_aux(self, x_raw: jnp.ndarray) -> Optional[dict]:
        for p in self.processors:
            if isinstance(p, BaseImputer):
                return p.compute_aux(x_raw)
        return None

    def loss_mask(self, aux) -> Optional[jnp.ndarray]:
        if aux is None:
            return None
        for p in self.processors:
            if isinstance(p, BaseImputer):
                return p.loss_mask(aux)
        return None

    @property
    def has_imputer(self) -> bool:
        return any(isinstance(p, BaseImputer) for p in self.processors)


class StepwiseProcessors:
    """One processor chain per forecast lead time, possibly sparse (ref
    preprocessing/__init__.py:210-258).  Lead times are arbitrary string
    keys ("6h", "12h", ...); missing steps yield ``None``."""

    def __init__(self, lead_times: List[str]) -> None:
        self._lead_times = [str(t) for t in lead_times]
        self._processors: Dict[str, Processors] = {}

    def __len__(self) -> int:
        return len(self._lead_times)

    def __iter__(self):
        for lead_time in self._lead_times:
            yield self._processors.get(str(lead_time))

    def __getitem__(self, index) -> Optional[Processors]:
        if isinstance(index, int):
            lead_time = self._lead_times[index]
        else:
            lead_time = str(index)
        return self._processors.get(str(lead_time))

    @property
    def lead_times(self) -> List[str]:
        return list(self._lead_times)

    def set(self, lead_time, processors: Processors) -> None:
        key = str(lead_time)
        if key not in self._lead_times:
            self._lead_times.append(key)
        self._processors[key] = processors

    def transform(self, x: jnp.ndarray, step: int) -> jnp.ndarray:
        chain = self[step]
        return x if chain is None else chain.transform(x)

    def inverse_transform(self, x: jnp.ndarray, step: int, aux=None) -> jnp.ndarray:
        chain = self[step]
        return x if chain is None else chain.inverse_transform(x, aux=aux)


def build_processors(
    configs: Optional[List[dict]],
    data_indices: IndexCollection,
    statistics: Dict[str, np.ndarray],
) -> Processors:
    """Build the ordered processor chain from config entries like
    [{"name": "InputImputer", "default": "mean"},
     {"name": "InputNormalizer", "default": "mean-std"}]."""
    processors = []
    reserved = {"name", "default", "value", "normalizer", "remap", "methods", "config"}
    for cfg in configs or []:
        cfg = dict(cfg)
        # reference-style configs put method keys at the top level
        # ({"default": "none", "mean": [y], 3.14: [q]}); fold list-valued
        # non-reserved keys into the ``methods`` dict
        extra = {
            k: cfg.pop(k)
            for k in list(cfg)
            if k not in reserved and isinstance(cfg[k], (list, tuple))
        }
        if extra:
            methods = dict(cfg.get("methods") or {})
            methods.update(extra)
            cfg["methods"] = methods
        processors.append(
            processor_registry.build_from_config(
                cfg, data_indices=data_indices, statistics=statistics
            )
        )
    return Processors(processors)


def build_stepwise_processors(
    configs: Dict[str, Optional[List[dict]]],
    data_indices: IndexCollection,
    statistics: Dict[str, np.ndarray],
) -> StepwiseProcessors:
    """{lead_time: [processor configs] | None} -> StepwiseProcessors."""
    stepwise = StepwiseProcessors(list(configs))
    for lead_time, cfgs in configs.items():
        if cfgs is not None:
            stepwise.set(lead_time, build_processors(cfgs, data_indices, statistics))
    return stepwise

"""Processor chain: ordered pre/post-processing.

Equivalent of /root/reference/models/src/anemoi/models/preprocessing/__init__.py:150
(`Processors`): applies each processor's transform in order (forward) and the
inverse transforms in reverse order (inverse)."""

from __future__ import annotations

from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from anemoi_tpu.data_indices.collection import IndexCollection
from anemoi_tpu.preprocessing.imputer import InputImputer
from anemoi_tpu.preprocessing.normalizer import InputNormalizer
from anemoi_tpu.preprocessing.remapper import CosSinRemapper
from anemoi_tpu.utils.registry import Registry

processor_registry = Registry("preprocessor")
processor_registry.register("InputNormalizer")(InputNormalizer)
processor_registry.register("InputImputer")(InputImputer)
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

    def inverse_transform(self, x: jnp.ndarray) -> jnp.ndarray:
        for p in reversed(self.processors):
            x = p.inverse_transform(x)
        return x


def build_processors(
    configs: Optional[List[dict]],
    data_indices: IndexCollection,
    statistics: Dict[str, np.ndarray],
) -> Processors:
    """Build the ordered processor chain from config entries like
    [{"name": "InputImputer", "default": "mean"},
     {"name": "InputNormalizer", "default": "mean-std"}]."""
    processors = []
    for cfg in configs or []:
        processors.append(
            processor_registry.build_from_config(
                dict(cfg), data_indices=data_indices, statistics=statistics
            )
        )
    return Processors(processors)

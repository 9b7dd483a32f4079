"""Output boundings: enforce physical ranges on model outputs.

Equivalents of /root/reference/models/src/anemoi/models/layers/bounding.py:26-397.
Pure functions over the trailing variable dim (functional `.at[]` updates in
place of torch in-place indexing).  Applied in config order after the decoder.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from anemoi_tpu.utils.registry import Registry

bounding_registry = Registry("bounding")


def _leaky_hardtanh(x, min_val, max_val, slope=0.01):
    below = jnp.minimum(x - min_val, 0.0) * slope
    above = jnp.maximum(x - max_val, 0.0) * slope
    return jnp.clip(x, min_val, max_val) + below + above


class Bounding:
    """A prepared bounding: holds resolved variable indices + the transform.

    Applied scatter-free: the transform is evaluated on the full variable dim
    and selected back with a static boolean mask (cheap VPU select; avoids
    slow TPU scatters from ``.at[idx].set``)."""

    def __init__(
        self,
        indices: np.ndarray,
        fn,
        num_vars: int,
        total_indices: Optional[np.ndarray] = None,
    ):
        mask = np.zeros(num_vars, dtype=bool)
        mask[indices] = True
        self.var_mask = jnp.asarray(mask)
        self.total_indices = None if total_indices is None else jnp.asarray(total_indices)
        self.fn = fn

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.total_indices is not None:
            total = x[..., self.total_indices]  # [..., 1]
            transformed = self.fn(x, total)
        else:
            transformed = self.fn(x)
        return jnp.where(self.var_mask, transformed, x)


def _resolve(variables: Sequence[str], name_to_index: Dict[str, int]) -> np.ndarray:
    idx = [name_to_index[v] for v in variables if v in name_to_index]
    missing = [v for v in variables if v not in name_to_index]
    if missing:
        raise KeyError(f"Bounding variables {missing} not in output space {sorted(name_to_index)}")
    return np.asarray(idx, dtype=np.int32)


@bounding_registry.register("relu")
def relu_bounding(variables, name_to_index, **_) -> Bounding:
    return Bounding(
        _resolve(variables, name_to_index), lambda x: jnp.maximum(x, 0.0),
        num_vars=len(name_to_index),
    )


@bounding_registry.register("leaky_relu")
def leaky_relu_bounding(variables, name_to_index, negative_slope: float = 0.01, **_) -> Bounding:
    return Bounding(
        _resolve(variables, name_to_index),
        lambda x: jnp.where(x >= 0, x, negative_slope * x),
        num_vars=len(name_to_index),
    )


@bounding_registry.register("hardtanh")
def hardtanh_bounding(variables, name_to_index, min_val: float, max_val: float, **_) -> Bounding:
    return Bounding(
        _resolve(variables, name_to_index), lambda x: jnp.clip(x, min_val, max_val),
        num_vars=len(name_to_index),
    )


@bounding_registry.register("leaky_hardtanh")
def leaky_hardtanh_bounding(
    variables, name_to_index, min_val: float, max_val: float, slope: float = 0.01, **_
) -> Bounding:
    return Bounding(
        _resolve(variables, name_to_index),
        lambda x: _leaky_hardtanh(x, min_val, max_val, slope),
        num_vars=len(name_to_index),
    )


@bounding_registry.register("fraction")
def fraction_bounding(
    variables, name_to_index, min_val: float, max_val: float, total_var: str, **_
) -> Bounding:
    """Clamp to [min,max] then scale by another variable (ref :253-298)."""
    return Bounding(
        _resolve(variables, name_to_index),
        lambda x, total: jnp.clip(x, min_val, max_val) * total,
        num_vars=len(name_to_index),
        total_indices=_resolve([total_var], name_to_index),
    )


@bounding_registry.register("leaky_fraction")
def leaky_fraction_bounding(
    variables, name_to_index, min_val: float, max_val: float, total_var: str, slope: float = 0.01, **_
) -> Bounding:
    return Bounding(
        _resolve(variables, name_to_index),
        lambda x, total: _leaky_hardtanh(x, min_val, max_val, slope) * total,
        num_vars=len(name_to_index),
        total_indices=_resolve([total_var], name_to_index),
    )


def build_boundings(configs: Optional[List[dict]], name_to_index: Dict[str, int]) -> List[Bounding]:
    """Build the ordered bounding list from config (ref :363-397)."""
    if not configs:
        return []
    return [
        bounding_registry.build_from_config(dict(cfg), name_to_index=name_to_index)
        for cfg in configs
    ]

"""NaN imputation.

Equivalent of /root/reference/models/src/anemoi/models/preprocessing/imputer.py:25-342:
replace NaNs in selected variables with a constant or a per-variable statistic
before the model, and restore them after (inverse).  The NaN mask is recorded
from the first transform (the reference caches it per batch geometry; here the
mask is recomputed per call, cheap and jit-friendly)."""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from anemoi_tpu.data_indices.collection import IndexCollection


class InputImputer:
    """method config: {"default": "none"|"mean"|"minimum"|..., <method>: [vars]}
    or explicit constant {"default": "constant", "value": 0.0}."""

    def __init__(
        self,
        data_indices: IndexCollection,
        statistics: Dict[str, np.ndarray],
        default: str = "none",
        methods: Optional[Dict[str, list]] = None,
        value: float = 0.0,
    ) -> None:
        name_to_index = data_indices.name_to_index
        n = len(name_to_index)
        fill = np.full(n, np.nan, dtype=np.float32)
        active = np.zeros(n, dtype=bool)

        def stat_value(method: str, i: int) -> float:
            if method == "constant":
                return float(value)
            if method in ("mean", "minimum", "maximum"):
                key = method
                return float(np.asarray(statistics[key if key != "minimum" else "minimum"])[i])
            if method == "stdev":
                return float(np.asarray(statistics["stdev"])[i])
            if method == "none":
                return np.nan
            raise ValueError(f"Unknown imputation method '{method}'")

        for name, i in name_to_index.items():
            if default != "none":
                fill[i] = stat_value(default, i)
                active[i] = True
        for method, variables in (methods or {}).items():
            for name in variables:
                i = name_to_index[name]
                fill[i] = stat_value(method, i)
                active[i] = True

        self._fill = jnp.asarray(np.where(active, fill, 0.0))
        self._active = jnp.asarray(active)
        self.data_indices = data_indices

    def transform(self, x: jnp.ndarray) -> jnp.ndarray:
        """Replace NaNs with fill values in active variables (data space [..., V])."""
        if x.shape[-1] != self._fill.shape[0]:
            return x  # model-space tensor: imputation operates on data space only
        nan_mask = jnp.isnan(x)
        replace = jnp.broadcast_to(self._fill, x.shape)
        return jnp.where(nan_mask & self._active, replace, x)

    def inverse_transform(self, x: jnp.ndarray) -> jnp.ndarray:
        """Identity: predictions are left dense (the loss applies NaN masks)."""
        return x

    def nan_mask(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.isnan(x)

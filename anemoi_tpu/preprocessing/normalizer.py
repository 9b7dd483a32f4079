"""Input normalisation.

Equivalent of /root/reference/models/src/anemoi/models/preprocessing/normalizer.py:24-260
(InputNormalizer): per-variable affine normalisation built from dataset
statistics, with methods mean-std / std / min-max / max / none and optional
statistic remapping between variables.

JAX-native: the normaliser precomputes `mul`/`add` vectors (host numpy) and
transform/inverse are pure functions (no in-place mutation)."""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from anemoi_tpu.data_indices.collection import IndexCollection

VALID_METHODS = ("mean-std", "std", "min-max", "max", "none")


class InputNormalizer:
    def __init__(
        self,
        data_indices: IndexCollection,
        statistics: Dict[str, np.ndarray],
        default: str = "mean-std",
        methods: Optional[Dict[str, str]] = None,
        remap: Optional[Dict[str, str]] = None,
    ) -> None:
        self.data_indices = data_indices
        name_to_index = data_indices.name_to_index
        methods = dict(methods or {})
        remap = dict(remap or {})

        minimum = np.array(statistics["minimum"], dtype=np.float64).copy()
        maximum = np.array(statistics["maximum"], dtype=np.float64).copy()
        mean = np.array(statistics["mean"], dtype=np.float64).copy()
        stdev = np.array(statistics["stdev"], dtype=np.float64).copy()

        # reuse statistics of one variable for another (ref :54-60)
        remapped = {
            name_to_index[tgt]: (
                minimum[name_to_index[src]],
                maximum[name_to_index[src]],
                mean[name_to_index[src]],
                stdev[name_to_index[src]],
            )
            for tgt, src in remap.items()
        }
        for i, stats in remapped.items():
            minimum[i], maximum[i], mean[i], stdev[i] = stats

        for name, method in methods.items():
            assert name in name_to_index, f"{name} is not a valid variable name"
            assert method in VALID_METHODS, f"{method} is not a valid normalisation method"

        n = len(name_to_index)
        norm_add = np.zeros(n, dtype=np.float32)
        norm_mul = np.ones(n, dtype=np.float32)
        for name, i in name_to_index.items():
            method = methods.get(name, default)
            if method == "mean-std":
                norm_mul[i] = 1.0 / stdev[i]
                norm_add[i] = -mean[i] / stdev[i]
            elif method == "std":
                norm_mul[i] = 1.0 / stdev[i]
            elif method == "min-max":
                span = maximum[i] - minimum[i]
                norm_mul[i] = 1.0 / span
                norm_add[i] = -minimum[i] / span
            elif method == "max":
                norm_mul[i] = 1.0 / maximum[i]
            elif method == "none":
                pass
            else:
                raise ValueError(f"Unknown normalisation method {method}")

        self._norm_mul = jnp.asarray(norm_mul)
        self._norm_add = jnp.asarray(norm_add)
        self._input_idx = jnp.asarray(data_indices.data.input.full)
        self._output_idx = jnp.asarray(data_indices.data.output.full)
        # model-output positions within the data-output index set (ref :110-125)
        model_out_names = set(data_indices.model.output.name_to_index)
        mask = np.array(
            [n in model_out_names for n in data_indices.data.output.ordered_names]
        )
        self._model_output_idx = jnp.asarray(
            np.asarray(data_indices.data.output.full)[mask]
        )

    # --- forward ------------------------------------------------------
    def transform(self, x: jnp.ndarray, data_index=None) -> jnp.ndarray:
        """Normalise [..., V]; V may be the full data space or data.input space."""
        if data_index is not None:
            return x * self._norm_mul[data_index] + self._norm_add[data_index]
        if x.shape[-1] == self._input_idx.shape[0]:
            return x * self._norm_mul[self._input_idx] + self._norm_add[self._input_idx]
        return x * self._norm_mul + self._norm_add

    # --- inverse ------------------------------------------------------
    def inverse_transform(self, x: jnp.ndarray, data_index=None) -> jnp.ndarray:
        if data_index is not None:
            idx = data_index
        elif x.shape[-1] == self._model_output_idx.shape[0]:
            idx = self._model_output_idx
        elif x.shape[-1] == self._output_idx.shape[0]:
            idx = self._output_idx
        else:
            return (x - self._norm_add) / self._norm_mul
        return (x - self._norm_add[idx]) / self._norm_mul[idx]

"""Output postprocessors.

Equivalent of /root/reference/models/src/anemoi/models/preprocessing/postprocessor.py:
identity on ``transform`` (inputs untouched); ``inverse_transform`` applies a
per-variable correction to model OUTPUT tensors:

- ``Postprocessor``             (:24): relu / hardtanh / hardtanh_0_1,
- ``NormalizedReluPostprocessor``(:131): max(x, c) with the threshold c mapped
  through the variable's normalisation (mean-std / min-max / max / std),
- ``ConditionalZeroPostprocessor``(:278): where a masking variable is 0,
  set selected outputs to fixed values,
- ``ConditionalNaNPostprocessor`` (:313): where the masking variable is NaN,
  set selected outputs to NaN.

All are scatter-free: per-variable masks + jnp.where."""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from anemoi_tpu.data_indices.collection import IndexCollection


class Postprocessor:
    """methods: {"relu": [vars]} / {"hardtanh": [...]} / {"hardtanh_0_1": [...]}."""

    _FUNCS = ("relu", "hardtanh", "hardtanh_0_1")

    def __init__(
        self,
        data_indices: IndexCollection,
        statistics: Optional[Dict[str, np.ndarray]] = None,
        default="none",
        methods: Optional[Dict] = None,
    ) -> None:
        self.data_indices = data_indices
        self.statistics = statistics or {}
        model_out = data_indices.model.output.name_to_index
        self.num_model_output_vars = len(model_out)

        per_var: Dict[str, object] = {}
        for method, variables in (methods or {}).items():
            for name in variables:
                per_var[name] = method
        self.method_of = {
            name: per_var.get(name, default) for name in model_out
        }
        for name, m in self.method_of.items():
            self._check_method(m, name)

        v = self.num_model_output_vars
        self._lo = np.full(v, -np.inf, dtype=np.float32)
        self._hi = np.full(v, np.inf, dtype=np.float32)
        for name, j in model_out.items():
            m = self.method_of[name]
            if m == "none":
                continue
            lo, hi = self._bounds(m, name)
            self._lo[j], self._hi[j] = lo, hi
        self._lo = jnp.asarray(self._lo)
        self._hi = jnp.asarray(self._hi)

    def _check_method(self, method, name):
        if method != "none" and method not in self._FUNCS:
            raise ValueError(f"Unknown postprocessing method '{method}'")

    def _bounds(self, method, name):
        return {
            "relu": (0.0, np.inf),
            "hardtanh": (-1.0, 1.0),
            "hardtanh_0_1": (0.0, 1.0),
        }[method]

    def transform(self, x: jnp.ndarray) -> jnp.ndarray:
        return x

    def inverse_transform(self, x: jnp.ndarray, aux=None) -> jnp.ndarray:
        if x.shape[-1] != self.num_model_output_vars:
            return x
        return jnp.clip(x, self._lo, self._hi)


class NormalizedReluPostprocessor(Postprocessor):
    """max(x, threshold) with thresholds given in PHYSICAL units and mapped
    through the variable's normaliser (ref :131-205): methods are numeric-
    keyed, e.g. {-2.0: [sst]}, plus ``normalizer`` in
    none | mean-std | min-max | max | std."""

    def __init__(self, data_indices, statistics=None, default="none",
                 methods=None, normalizer: str = "none"):
        self.normalizer = normalizer
        if normalizer not in {"none", "mean-std", "min-max", "max", "std"}:
            raise ValueError(f"Unknown normalizer '{normalizer}'")
        super().__init__(data_indices, statistics, default, methods)

    def _check_method(self, method, name):
        if method == "none":
            return
        float(method)  # numeric-keyed

    def _bounds(self, method, name):
        thr = float(method)
        i = self.data_indices.name_to_index[name]
        s = self.statistics
        if self.normalizer == "mean-std":
            thr = (thr - float(np.asarray(s["mean"])[i])) / float(np.asarray(s["stdev"])[i])
        elif self.normalizer == "min-max":
            lo = float(np.asarray(s["minimum"])[i])
            hi = float(np.asarray(s["maximum"])[i])
            thr = (thr - lo) / max(hi - lo, 1e-12)
        elif self.normalizer == "max":
            thr = thr / max(float(np.asarray(s["maximum"])[i]), 1e-12)
        elif self.normalizer == "std":
            thr = thr / max(float(np.asarray(s["stdev"])[i]), 1e-12)
        return thr, np.inf


class ConditionalPostprocessor(Postprocessor):
    """Set selected outputs to per-variable values where a masking variable
    satisfies a condition (ref :206-277).  methods are numeric-keyed:
    {0.0: [cp]} with ``remap: tp`` -> where tp triggers, cp := 0."""

    def __init__(self, data_indices, statistics=None, default="none",
                 methods=None, remap: Optional[str] = None):
        assert remap is not None, "ConditionalPostprocessor needs 'remap'"
        self.masking_variable = remap
        super().__init__(data_indices, statistics, default, methods)
        model_out = data_indices.model.output.name_to_index
        self.masking_index = model_out.get(remap)
        v = self.num_model_output_vars
        fill = np.zeros(v, dtype=np.float32)
        active = np.zeros(v, dtype=bool)
        for name, j in model_out.items():
            m = self.method_of[name]
            if m == "none":
                continue
            active[j] = True
            fill[j] = float(m)
        self._fill = jnp.asarray(fill)
        self._active = jnp.asarray(active)

    def _check_method(self, method, name):
        if method == "none":
            return
        float(method)

    def _bounds(self, method, name):
        return -np.inf, np.inf  # unused; conditional fill instead of clip

    def condition(self, masking: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def inverse_transform(self, x: jnp.ndarray, aux=None) -> jnp.ndarray:
        if x.shape[-1] != self.num_model_output_vars or self.masking_index is None:
            return x
        cond = self.condition(x[..., self.masking_index])[..., None]
        return jnp.where(cond & self._active, self._fill, x)


class ConditionalZeroPostprocessor(ConditionalPostprocessor):
    """Where the masking variable is 0, set outputs to the given values (:278)."""

    def condition(self, masking: jnp.ndarray) -> jnp.ndarray:
        return masking == 0.0


class ConditionalNaNPostprocessor(ConditionalPostprocessor):
    """Where the masking variable is NaN, set outputs to NaN (:313)."""

    def __init__(self, data_indices, statistics=None, default="none",
                 methods=None, remap: Optional[str] = None):
        # every selected variable is set to NaN; methods may list variables
        # under any numeric key or via {"nan": [...]}
        super().__init__(data_indices, statistics, default,
                         self._coerce(methods), remap=remap)
        self._fill = jnp.where(self._active, jnp.nan, self._fill)

    @staticmethod
    def _coerce(methods):
        return {0.0 if k == "nan" else k: v for k, v in (methods or {}).items()}

    def condition(self, masking: jnp.ndarray) -> jnp.ndarray:
        return jnp.isnan(masking)

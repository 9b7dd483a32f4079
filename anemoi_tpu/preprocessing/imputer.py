"""NaN imputation.

Equivalent of /root/reference/models/src/anemoi/models/preprocessing/imputer.py:
replace NaNs in selected variables before the model and restore them after.

Reference semantics covered:
- ``InputImputer``   (:282): fill from per-variable statistics,
- ``ConstantImputer``(:313): numeric-keyed config ``{1.0: [x, y]}``,
- ``CopyImputer``    (:342): copy the value of another variable,
- NaN re-insertion on ``inverse_transform`` at the ORIGINAL input NaN
  locations (:243-280),
- the training loss mask (:219-227): zero loss weight where an imputed
  input variable that is also a model output was NaN.

The reference caches the NaN mask as module state between transform and
inverse; in JAX everything is functional, so the mask travels explicitly:
``aux = imputer.compute_aux(raw_batch)`` -> ``inverse_transform(y, aux=aux)``
and ``loss_mask(aux)`` (wired through preprocessing.processors.Processors and
the training step).  The mask is taken from the first time step and first
ensemble member, like the reference (get_nans, :116)."""

from __future__ import annotations

from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from anemoi_tpu.data_indices.collection import IndexCollection


class BaseImputer:
    """Shared index bookkeeping for all imputer flavours."""

    def __init__(
        self,
        data_indices: IndexCollection,
        statistics: Optional[Dict[str, np.ndarray]] = None,
        default="none",
        methods: Optional[Dict] = None,
    ) -> None:
        self.data_indices = data_indices
        self.statistics = statistics or {}
        name_to_index = data_indices.name_to_index
        self.num_data_vars = len(name_to_index)
        model_in = data_indices.model.input.name_to_index
        model_out = data_indices.model.output.name_to_index
        self.num_model_input_vars = len(model_in)
        self.num_model_output_vars = len(model_out)

        # per-variable method: explicit per-variable entries override default
        per_var: Dict[str, object] = {}
        for method, variables in (methods or {}).items():
            for name in variables:
                per_var[name] = method
        self.method_of = {
            name: per_var.get(name, default) for name in name_to_index
        }

        # data-space fill values [V_data]; model-input-space fill [V_model_in]
        fill_data = np.zeros(self.num_data_vars, dtype=np.float32)
        active_data = np.zeros(self.num_data_vars, dtype=bool)
        copy_src_data = np.zeros(self.num_data_vars, dtype=np.int32)
        is_copy = np.zeros(self.num_data_vars, dtype=bool)
        for name, i in name_to_index.items():
            method = self.method_of[name]
            if method == "none":
                continue
            active_data[i] = True
            if self._is_copy_method(method):
                is_copy[i] = True
                copy_src_data[i] = name_to_index[str(method)]
            else:
                fill_data[i] = self._fill_value(method, name, i)

        self._fill_data = jnp.asarray(fill_data)
        self._active_data = jnp.asarray(active_data)
        self._copy_src_data = jnp.asarray(copy_src_data)
        self._is_copy_data = jnp.asarray(is_copy)

        # model-input-space variants (inference tensors)
        fill_in = np.zeros(self.num_model_input_vars, dtype=np.float32)
        active_in = np.zeros(self.num_model_input_vars, dtype=bool)
        copy_src_in = np.zeros(self.num_model_input_vars, dtype=np.int32)
        is_copy_in = np.zeros(self.num_model_input_vars, dtype=bool)
        for name, j in model_in.items():
            i = name_to_index[name]
            method = self.method_of[name]
            if method == "none":
                continue
            active_in[j] = True
            if self._is_copy_method(method):
                src = str(method)
                if src not in model_in:
                    raise ValueError(
                        f"CopyImputer source '{src}' is not a model input"
                    )
                is_copy_in[j] = True
                copy_src_in[j] = model_in[src]
            else:
                fill_in[j] = self._fill_value(method, name, i)
        self._fill_in = jnp.asarray(fill_in)
        self._active_in = jnp.asarray(active_in)
        self._copy_src_in = jnp.asarray(copy_src_in)
        self._is_copy_in = jnp.asarray(is_copy_in)

        # inverse / loss-mask coupling: model-OUTPUT var -> model-INPUT var
        # (only for imputed vars present in both)
        out_from_in = np.full(self.num_model_output_vars, -1, dtype=np.int32)
        for name, j_out in model_out.items():
            if name in model_in and self.method_of.get(name, "none") != "none":
                out_from_in[j_out] = model_in[name]
        self._out_from_in = jnp.asarray(out_from_in)

    # -- flavour hooks --------------------------------------------------
    def _is_copy_method(self, method) -> bool:
        return False

    def _fill_value(self, method, name: str, data_index: int) -> float:
        raise NotImplementedError

    # -- API ------------------------------------------------------------
    def transform(self, x: jnp.ndarray) -> jnp.ndarray:
        """Fill NaNs in active variables.  Accepts data-space [..., V_data]
        or model-input-space [..., V_model_in] tensors (ref transform
        :189-241 chooses indices by the trailing dim)."""
        v = x.shape[-1]
        if v == self.num_data_vars:
            fill, active = self._fill_data, self._active_data
            copy_src, is_copy = self._copy_src_data, self._is_copy_data
        elif v == self.num_model_input_vars and v != self.num_data_vars:
            fill, active = self._fill_in, self._active_in
            copy_src, is_copy = self._copy_src_in, self._is_copy_in
        else:
            return x
        nan = jnp.isnan(x)
        replacement = jnp.where(
            is_copy, jnp.take(x, copy_src, axis=-1), fill
        )
        return jnp.where(nan & active, replacement, x)

    def compute_aux(self, x_raw: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """NaN bookkeeping from the RAW (pre-transform) batch [B,T,E,G,V].

        nan_mask: [B, G, V] NaN locations at the first time step / member
        (ref get_nans :116); loss_mask: [B, G, V_model_out] zero where an
        imputed input that is also an output was NaN (ref :219-227)."""
        first = x_raw[:, 0]
        while first.ndim > 3:
            first = first[:, 0]
        nan_mask = jnp.isnan(first)  # [B, G, V]
        if nan_mask.shape[-1] == self.num_data_vars:
            model_in_cols = jnp.asarray(
                np.asarray(self.data_indices.data.input.full, dtype=np.int32)
            )
            nan_in = jnp.take(nan_mask, model_in_cols, axis=-1)
        else:
            nan_in = nan_mask
        src = jnp.clip(self._out_from_in, 0, None)
        masked_out = jnp.take(nan_in, src, axis=-1) & (self._out_from_in >= 0)
        loss_mask = 1.0 - masked_out.astype(jnp.float32)  # [B, G, V_out]
        return {"nan_mask_in": nan_in, "loss_mask": loss_mask}

    def loss_mask(self, aux) -> jnp.ndarray:
        return aux["loss_mask"]

    def inverse_transform(
        self, x: jnp.ndarray, aux: Optional[Dict[str, jnp.ndarray]] = None
    ) -> jnp.ndarray:
        """Re-insert NaNs at the original input NaN locations for imputed
        output variables (ref inverse_transform :243-280).  Without ``aux``
        (no recorded mask) this is the identity, and the loss applies its
        own NaN mask on targets."""
        if aux is None or x.shape[-1] != self.num_model_output_vars:
            return x
        nan_in = aux["nan_mask_in"]  # [B, G, V_in]
        src = jnp.clip(self._out_from_in, 0, None)
        mask = jnp.take(nan_in, src, axis=-1) & (self._out_from_in >= 0)
        # x: [B, T, E, G, V_out]; mask: [B, G, V_out]
        expand = mask.reshape(
            mask.shape[0], *([1] * (x.ndim - 3)), mask.shape[1], mask.shape[2]
        )
        return jnp.where(expand, jnp.nan, x)


class InputImputer(BaseImputer):
    """Statistics-based imputation (ref :282): method in
    mean | stdev | minimum | maximum | constant (with ``value``) | none."""

    def __init__(self, data_indices, statistics=None, default="none",
                 methods=None, value: float = 0.0):
        self._constant_value = float(value)
        super().__init__(data_indices, statistics, default, methods)

    def _fill_value(self, method, name, data_index):
        if method == "constant":
            return self._constant_value
        if method in ("mean", "stdev", "minimum", "maximum"):
            return float(np.asarray(self.statistics[method])[data_index])
        raise ValueError(f"Unknown imputation method '{method}'")


class ConstantImputer(BaseImputer):
    """Numeric-keyed config (ref :313): ``{0: [x], 3.14: [q]}`` -- the method
    IS the fill value."""

    def _fill_value(self, method, name, data_index):
        return float(method)


class CopyImputer(BaseImputer):
    """Copy the value of another variable at the NaN location (ref :342):
    ``{source_variable: [missing_1, missing_2]}``."""

    def _is_copy_method(self, method) -> bool:
        return method != "none"

    def _fill_value(self, method, name, data_index):  # pragma: no cover
        raise AssertionError("CopyImputer fills by copying, not by value")


class DynamicInputImputer(InputImputer):
    """Alias: the JAX imputers recompute the NaN mask every call already
    (the reference's Dynamic* variants exist because the torch ones cache)."""


class DynamicConstantImputer(ConstantImputer):
    pass


class DynamicCopyImputer(CopyImputer):
    pass

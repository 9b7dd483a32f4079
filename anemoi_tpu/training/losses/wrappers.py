"""Loss wrappers: variable filtering and time aggregation.

Equivalents of
/root/reference/training/src/anemoi/training/losses/variable_mapper.py:29
(``LossVariableMapper``) and aggregate.py:29 (``TimeAggregateLossWrapper``).

JAX-first differences from the reference:
- variable index resolution happens eagerly at construction (indices are
  static under jit; `jnp.take` on the trailing axis instead of advanced
  indexing),
- variable-axis scalers attached to the wrapped loss are filtered once at
  construction instead of intercepting ``add_scaler`` calls (scalers here are
  immutable inputs to the jitted step).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax.numpy as jnp

from anemoi_tpu.training.losses.base import BaseLoss, ScaleTensor, loss_registry

#: index-space layouts, mirroring the reference's IndexSpace enum
#: (training/utils/index_space.py): which name->position table interprets the
#: trailing variable axis of a tensor.
LAYOUTS = ("model_output", "data_output", "data_full")


def _layout_table(data_indices, layout: str) -> dict:
    if layout == "model_output":
        return data_indices.model.output.name_to_position
    if layout == "data_output":
        return data_indices.data.output.name_to_position
    if layout == "data_full":
        return data_indices.data_full_name_to_position
    raise ValueError(f"Invalid layout '{layout}'. Expected one of {LAYOUTS}")


@loss_registry.register("LossVariableMapper")
class LossVariableMapper(BaseLoss):
    """Filter the variable axis before delegating to the wrapped loss
    (ref variable_mapper.py:29).

    ``predicted_variables`` selects model-output variables, and
    ``target_variables`` (default: the same names) selects the matching
    target columns; layouts name the index space of each tensor's trailing
    axis.  With ``squash=False`` the per-variable losses are scattered back
    to the full model-output width, zeros elsewhere (matching the
    reference's metric contract, variable_mapper.py:370-385).
    """

    def __init__(
        self,
        loss: BaseLoss,
        data_indices,
        predicted_variables: Optional[List[str]] = None,
        target_variables: Optional[List[str]] = None,
        pred_layout: str = "model_output",
        target_layout: str = "data_output",
    ):
        super().__init__(scalers=None, ignore_nans=loss.ignore_nans)
        if predicted_variables is not None and target_variables is not None:
            assert len(predicted_variables) == len(target_variables), (
                "predicted and target variables must have the same length"
            )
        if predicted_variables is None:
            predicted_variables = list(data_indices.model.output.ordered_names)
        if target_variables is None:
            target_variables = list(predicted_variables)
        self.loss = loss
        self.predicted_variables = list(predicted_variables)
        self.target_variables = list(target_variables)
        self.pred_layout = pred_layout
        self.target_layout = target_layout
        self.data_indices = data_indices
        self.pred_indices = self._resolve(predicted_variables, pred_layout)
        self.target_indices = self._resolve(target_variables, target_layout)
        self._filter_variable_scalers()

    @property
    def supports_sharding(self) -> bool:  # delegate to the wrapped loss
        return self.loss.supports_sharding

    def _resolve(self, names: Sequence[str], layout: str) -> List[int]:
        table = _layout_table(self.data_indices, layout)
        missing = [n for n in names if n not in table]
        if missing:
            raise ValueError(
                f"Cannot resolve variables {missing} in layout '{layout}'. "
                f"Available: {sorted(table)}"
            )
        return [table[n] for n in names]

    def _filter_variable_scalers(self) -> None:
        """Subset every variable-axis scaler of the wrapped loss to the
        selected prediction variables (ref variable_mapper.py:112-135).
        Size-1 (broadcast) scalers and scalers already sized to the subset
        pass through unchanged."""
        n_sel = len(self.pred_indices)
        layout_sizes = {
            len(self.data_indices.model.output.ordered_names),
            len(self.data_indices.data.output.ordered_names),
            len(self.data_indices.data_full_name_to_position),
        }
        filtered = {}
        for name, (dims, arr) in self.loss.scalers.scalers.items():
            if "variable" in dims:
                axis = dims.index("variable")
                size = arr.shape[axis]
                if size == n_sel or size == 1:
                    pass  # broadcast or pre-filtered
                elif size in layout_sizes:
                    # scaler laid out in a full index space: take the
                    # positions of the selected variables in THAT space
                    if size == len(self.data_indices.model.output.ordered_names):
                        idx = self.pred_indices if self.pred_layout == "model_output" else self._resolve(self.predicted_variables, "model_output")
                    elif size == len(self.data_indices.data.output.ordered_names):
                        idx = self._resolve(self.predicted_variables, "data_output")
                    else:
                        idx = self._resolve(self.predicted_variables, "data_full")
                    arr = jnp.take(arr, jnp.asarray(idx), axis=axis)
                else:
                    raise ValueError(
                        f"Cannot map VARIABLE-axis scaler '{name}' (size {size}) "
                        f"to a known index space; known sizes: {sorted(layout_sizes)}"
                    )
            filtered[name] = (dims, arr)
        self.loss.scalers = ScaleTensor(filtered)

    def __call__(self, pred, target, squash: bool = True, **kwargs):
        pred_f = jnp.take(pred, jnp.asarray(self.pred_indices), axis=-1)
        target_f = jnp.take(target, jnp.asarray(self.target_indices), axis=-1)
        if squash:
            return self.loss(pred_f, target_f, squash=True, **kwargs)
        per_var = self.loss(pred_f, target_f, squash=False, **kwargs)
        out = jnp.zeros(pred.shape[-1], dtype=per_var.dtype)
        return out.at[jnp.asarray(self.pred_indices)].set(per_var)


@loss_registry.register("TimeAggregateLossWrapper")
class TimeAggregateLossWrapper(BaseLoss):
    """Apply the wrapped loss to time-aggregated predictions
    (ref aggregate.py:29).

    ``time_aggregation_types`` from {"diff", "mean", "min", "max"}:
    "diff" scores per-step temporal differences (each step weighted by the
    wrapped loss's time scaler, if any); the others reduce the whole time
    window first.  The result is averaged over the number of aggregation
    types.
    """

    _AGG = {"mean": jnp.mean, "min": jnp.min, "max": jnp.max}

    def __init__(self, loss: BaseLoss, time_aggregation_types: Sequence[str]):
        super().__init__(scalers=None, ignore_nans=loss.ignore_nans)
        for op in time_aggregation_types:
            if op != "diff" and op not in self._AGG:
                raise ValueError(
                    f"Unknown aggregation type '{op}'. Supported: "
                    f"'diff', {sorted(self._AGG)}."
                )
        self.loss = loss
        self.time_aggregation_types = list(time_aggregation_types)
        # time-bound scalers are excluded from inner calls: aggregation
        # changes the time length, and "diff" applies the weights manually
        self._time_scaler_names = [
            n for n, (dims, _) in loss.scalers.scalers.items() if "time" in dims
        ]
        self._time_weights = None
        for n in self._time_scaler_names:
            dims, arr = loss.scalers.scalers[n]
            self._time_weights = arr.reshape(-1)
            break

    @property
    def supports_sharding(self) -> bool:
        return self.loss.supports_sharding

    def __call__(self, pred, target, squash: bool = True, **kwargs):
        assert pred.shape[1] > 1, (
            "TimeAggregateLossWrapper requires a time dimension > 1"
        )
        without = list(kwargs.pop("without_scalers", None) or [])
        without += [n for n in self._time_scaler_names if n not in without]
        total = 0.0
        for op in self.time_aggregation_types:
            if op == "diff":
                total = total + self._diff_loss(pred, target, squash, without, kwargs)
            else:
                fn = self._AGG[op]
                p = fn(pred, axis=1, keepdims=True)
                t = fn(target, axis=1, keepdims=True)
                total = total + self.loss(
                    p, t, squash=squash, without_scalers=without, **kwargs
                )
        return total / max(len(self.time_aggregation_types), 1)

    def _diff_loss(self, pred, target, squash, without, kwargs):
        dp = pred[:, 1:] - pred[:, :-1]
        dt = target[:, 1:] - target[:, :-1]
        total = 0.0
        for step in range(dp.shape[1]):
            step_loss = self.loss(
                dp[:, step : step + 1],
                dt[:, step : step + 1],
                squash=squash,
                without_scalers=without,
                **kwargs,
            )
            if self._time_weights is not None and step < self._time_weights.shape[0]:
                step_loss = step_loss * self._time_weights[step]
            total = total + step_loss
        return total

"""Loss framework: composable dimension-tagged scalers + weighted reductions.

Equivalent of /root/reference/training/src/anemoi/training/losses/base.py:42-250
(BaseLoss) and scaler_tensor.py:81 (ScaleTensor).

A `ScaleTensor` holds named scalers, each bound to named tensor dimensions of
the prediction tensor [batch, time, ensemble, grid, variable]; `scale()`
multiplies them in with broadcasting.  Losses reduce over all dims with
scaler-aware averaging; NaN targets are masked out (the reference's
NaN-masking scaler path).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from anemoi_tpu.utils.registry import Registry

loss_registry = Registry("loss")

# canonical prediction layout
DIMS = {"batch": 0, "time": 1, "ensemble": 2, "grid": 3, "variable": 4}


class ScaleTensor:
    """Named scalers bound to named dims of [B, T, E, G, V] tensors."""

    def __init__(self, scalers: Optional[Dict[str, Tuple[Tuple[str, ...], jnp.ndarray]]] = None):
        # name -> (dims tuple, array whose shape matches those dims in order)
        self.scalers: Dict[str, Tuple[Tuple[str, ...], jnp.ndarray]] = dict(scalers or {})
        self._frozen: set = set()

    def add_scaler(self, dims, array, name: str) -> "ScaleTensor":
        if isinstance(dims, str):
            dims = (dims,)
        dims = tuple(dims)
        for d in dims:
            assert d in DIMS, f"Unknown dim '{d}' (valid: {sorted(DIMS)})"
        array = jnp.asarray(array)
        assert array.ndim == len(dims), (
            f"scaler '{name}' has {array.ndim} axes for dims {dims}"
        )
        if name in self.scalers:
            # same-name add composes multiplicatively on matching dims
            # (ref scaler_tensor.py:226-291 add_scaler semantics)
            old_dims, old = self.scalers[name]
            assert old_dims == dims, (
                f"scaler '{name}' exists with dims {old_dims}, got {dims}"
            )
            array = old * array
        self.scalers[name] = (dims, array)
        return self

    def update_scaler(self, name: str, array, override: bool = False) -> "ScaleTensor":
        """Replace an existing scaler's values in place -- the reference's
        updating-scaler hook (scaler_tensor.py:340, BaseUpdatingScaler):
        per-batch scalers (e.g. the imputer NaN mask) refresh through this.
        Frozen scalers refuse unless ``override``."""
        assert name in self.scalers, f"unknown scaler '{name}'"
        if name in self._frozen and not override:
            raise ValueError(f"scaler '{name}' is frozen (pass override=True)")
        dims, old = self.scalers[name]
        array = jnp.asarray(array)
        assert array.shape == old.shape, (
            f"updating scaler '{name}': shape {array.shape} != {old.shape}"
        )
        self.scalers[name] = (dims, array)
        return self

    def freeze(self, names: Optional[Sequence[str]] = None) -> "ScaleTensor":
        """Mark scalers immutable to update_scaler (ref freeze_state :311)."""
        self._frozen.update(names if names is not None else self.scalers)
        return self

    def validate(self, shape: Sequence[int]) -> None:
        """Assert every scaler broadcasts against a [B,T,E,G,V]-shaped tensor
        (ref validate_scaler :197): each bound dim must match or be 1."""
        for name, (dims, array) in self.scalers.items():
            for d, size in zip(dims, array.shape):
                want = shape[DIMS[d]]
                if size not in (1, want):
                    raise ValueError(
                        f"scaler '{name}' dim '{d}' has size {size}, tensor has {want}"
                    )

    def subset(self, names: Sequence[str]) -> "ScaleTensor":
        return ScaleTensor({n: self.scalers[n] for n in names if n in self.scalers})

    def without(self, names: Sequence[str]) -> "ScaleTensor":
        drop = set(names)
        return ScaleTensor({n: s for n, s in self.scalers.items() if n not in drop})

    def _dims_set(self, dimensions) -> set:
        if isinstance(dimensions, (int, str)):
            dimensions = [dimensions]
        names = {d if isinstance(d, str) else None for d in dimensions}
        idx = {d for d in dimensions if isinstance(d, int)}
        return {n for n in DIMS if n in names or DIMS[n] in idx}

    def subset_by_dim(self, dimensions) -> "ScaleTensor":
        """Scalers touching any of the given dims (names or axis indices;
        ref scaler_tensor.py:455)."""
        keep = self._dims_set(dimensions)
        return ScaleTensor(
            {n: s for n, s in self.scalers.items() if set(s[0]) & keep}
        )

    def without_by_dim(self, dimensions) -> "ScaleTensor":
        """Scalers touching NONE of the given dims (ref :519)."""
        drop = self._dims_set(dimensions)
        return ScaleTensor(
            {n: s for n, s in self.scalers.items() if not set(s[0]) & drop}
        )

    def _broadcast(self, dims: Tuple[str, ...], array: jnp.ndarray, ndim: int) -> jnp.ndarray:
        shape = [1] * ndim
        for axis_name, size in zip(dims, array.shape):
            shape[DIMS[axis_name]] = size
        return array.reshape(shape)

    def scale(self, x: jnp.ndarray) -> jnp.ndarray:
        for dims, array in self.scalers.values():
            x = x * self._broadcast(dims, array, x.ndim)
        return x

    def combined_weight(self, shape: Tuple[int, ...]) -> jnp.ndarray:
        """The product of all scalers broadcast to ``shape`` (for normalisation)."""
        w = jnp.ones((1,) * len(shape))
        for dims, array in self.scalers.values():
            w = w * self._broadcast(dims, array, len(shape))
        return jnp.broadcast_to(w, shape)

    def __contains__(self, name: str) -> bool:
        return name in self.scalers

    def __repr__(self) -> str:
        parts = [f"{n}:{dims}{tuple(a.shape)}" for n, (dims, a) in self.scalers.items()]
        return f"ScaleTensor({', '.join(parts)})"


class BaseLoss:
    """Scaler-weighted loss with NaN masking.

    Reduction semantics follow the reference (losses/base.py:179-250): the
    pointwise error is multiplied by every scaler, NaN targets drop out of
    both numerator and denominator, and the result is the weighted mean.
    """

    supports_sharding = True

    def __init__(self, scalers: Optional[ScaleTensor] = None, ignore_nans: bool = True):
        self.scalers = scalers or ScaleTensor()
        self.ignore_nans = ignore_nans

    # subclasses implement the pointwise error
    def error(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def __call__(
        self,
        pred: jnp.ndarray,  # [B, T, E, G, V]
        target: jnp.ndarray,
        squash: bool = True,
        scaler_subset: Optional[Sequence[str]] = None,
        without_scalers: Optional[Sequence[str]] = None,
        mask: Optional[jnp.ndarray] = None,  # [B, G, V] imputer loss mask
    ) -> jnp.ndarray:
        scalers = self.scalers
        if scaler_subset is not None:
            scalers = scalers.subset(scaler_subset)
        if without_scalers is not None:
            scalers = scalers.without(without_scalers)

        if self.ignore_nans:
            # Zero-fill BOTH operands before computing the error (ref losses
            # base.py mask_nans): masking err afterwards with jnp.where is not
            # enough under AD, because the zero cotangent still multiplies the
            # NaN derivative (0*NaN=NaN) and poisons every gradient.
            valid = ~jnp.isnan(target)
            pred = jnp.where(valid, pred, 0.0)
            target = jnp.where(valid, target, 0.0)
            err = self.error(pred, target) * valid.astype(pred.dtype)
        else:
            err = self.error(pred, target)
            valid = jnp.ones_like(err, dtype=bool)

        weighted = scalers.scale(err)
        weight = scalers.combined_weight(err.shape) * valid.astype(err.dtype)
        if mask is not None:
            # imputer-coupled loss mask (ref imputer.py:219-227
            # loss_mask_training): zero weight where an imputed input that is
            # also an output variable was NaN.  mask: [B, G, V] broadcast
            # over time/ensemble.
            m = mask.reshape(
                mask.shape[0], *([1] * (err.ndim - 3)), mask.shape[-2], mask.shape[-1]
            ).astype(err.dtype)
            weighted = weighted * m
            weight = weight * m

        if squash:
            return jnp.sum(weighted) / jnp.maximum(jnp.sum(weight), 1e-12)
        # per-variable reduction (for metrics): mean over all but variable dim
        axes = tuple(i for i in range(err.ndim - 1))
        return jnp.sum(weighted, axis=axes) / jnp.maximum(jnp.sum(weight, axis=axes), 1e-12)

    @property
    def name(self) -> str:
        return self.__class__.__name__.lower()


def get_loss_function(
    config: dict,
    scalers: Optional[Dict[str, Tuple[Tuple[str, ...], jnp.ndarray]]] = None,
    graph=None,
    dataset: str = "data",
    data_indices=None,
    variables_metadata: Optional[dict] = None,
) -> BaseLoss:
    """Factory (ref losses/loss.py:142): build a loss from config, attaching
    the requested subset of pre-built scalers.

    config: {"name": "WeightedMSELoss", "scalers": ["area_weight", "variable"], ...}
    ``graph``/``dataset`` are only needed by graph-coupled wrappers
    (MultiscaleLossWrapper resolves its coarsening projections from them);
    ``data_indices`` only by LossVariableMapper.  Wrapper configs nest the
    wrapped loss under a "loss" key.
    """
    cfg = dict(config)
    name = cfg.pop("name", "WeightedMSELoss")
    if name == "MultiscaleLossWrapper":
        from anemoi_tpu.training.losses.multiscale import build_multiscale_loss

        return build_multiscale_loss(config, scalers, graph=graph, dataset=dataset)
    if name in ("LossVariableMapper", "TimeAggregateLossWrapper"):
        from anemoi_tpu.training.losses import wrappers  # registers classes

        inner_cfg = dict(cfg.pop("loss", {"name": "WeightedMSELoss"}))
        # a "scalers" key on the wrapper (e.g. merged in from a preset)
        # delegates to the wrapped loss, mirroring the reference wrappers'
        # add_scaler pass-through (variable_mapper.py:138-143)
        wrapper_scalers = cfg.pop("scalers", None)
        if wrapper_scalers is not None and "scalers" not in inner_cfg:
            inner_cfg["scalers"] = wrapper_scalers
        inner = get_loss_function(
            inner_cfg,
            scalers, graph=graph, dataset=dataset, data_indices=data_indices,
            variables_metadata=variables_metadata,
        )
        if name == "LossVariableMapper":
            assert data_indices is not None, "LossVariableMapper needs data_indices"
            wrapped = wrappers.LossVariableMapper(inner, data_indices, **cfg)
            # units of each predicted/target pair must agree when the mapper
            # scores one variable against another (ref losses/utils.py:92)
            from anemoi_tpu.utils.variables_metadata import (
                check_loss_variable_units_compatibility,
            )

            if wrapped.predicted_variables != wrapped.target_variables:
                check_loss_variable_units_compatibility(
                    wrapped.predicted_variables,
                    wrapped.target_variables,
                    variables_metadata,
                )
            return wrapped
        return wrappers.TimeAggregateLossWrapper(inner, **cfg)
    wanted = cfg.pop("scalers", ["*"])
    st = ScaleTensor()
    available = scalers or {}
    if "*" in wanted:
        wanted = list(available)
    for scaler_name in wanted:
        if scaler_name in available:
            dims, arr = available[scaler_name]
            st.add_scaler(dims, arr, scaler_name)
    return loss_registry.get(name)(scalers=st, **cfg)


def variable_scaling_summary(loss: BaseLoss, data_indices) -> Dict[str, float]:
    """Effective per-variable loss weight: the product of every
    variable-dim scaler attached to the loss, keyed by model-output variable
    name (ref losses/utils.py:38 print_variable_scaling)."""
    names = data_indices.model.output.ordered_names
    total = np.ones(len(names), dtype=np.float64)
    st = getattr(loss, "scalers", None)
    for dims, arr in (st.scalers.values() if st is not None else ()):
        if "variable" in dims:
            a = np.asarray(arr, dtype=np.float64).reshape(-1)
            if len(a) == len(names):
                total *= a
    return {name: float(total[i]) for i, name in enumerate(names)}

"""Loss-weight scaler builders.

Equivalents of /root/reference/training/src/anemoi/training/losses/scalers/*:
- GraphNodeAttributeScaler / ReweightedGraphNodeAttributeScaler
  (node_attributes.py:24,67): grid weights from a graph node attribute
- GeneralVariableLossScaler (variable.py:53): per-variable weights from config
- VariableMaskingLossScaler (variable_masking.py:22): mask variables out/in
- Linear/Relu/Polynomial/No VariableLevelScaler (variable_level.py:97-142):
  pressure-level weighting, filtered to a variable *group* resolved via
  ExtractVariableGroupAndLevel (utils/variables_metadata.py)
- No/Stdev/Var TendencyScaler (variable_tendency.py:104-123)
- TimeStep/UniformTimeStep/LeadTimeDecay scalers (time_step.py:21,51,76)
- SpectralDimensionScaler (spectral.py:21)

`create_scalers` builds the named dict consumed by `get_loss_function`.
Each scaler is (dims tuple, numpy array). NaN masking (loss_weights_mask.py)
lives in BaseLoss directly (losses/base.py).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from anemoi_tpu.data_indices.collection import IndexCollection
from anemoi_tpu.graphs.graph import Graph
from anemoi_tpu.utils.registry import Registry
from anemoi_tpu.utils.variables_metadata import (
    ExtractVariableGroupAndLevel,
    crack_variable_name,
)

scaler_registry = Registry("loss scaler")

# back-compat alias (pre-round-4 name)
split_variable_name = crack_variable_name


def _apply_norm(w: np.ndarray, norm: Optional[str]) -> np.ndarray:
    """Reference BaseScaler.normalise (base_scaler.py): None keeps raw values."""
    if norm is None:
        return w
    if norm in ("unit-sum", "l1"):
        return w / np.abs(w).sum()
    if norm == "unit-mean":
        return w / np.abs(w).mean()
    if norm == "unit-max":
        return w / np.abs(w).max()
    raise ValueError(f"Unknown scaler norm {norm!r}")


def _extractor(
    metadata_extractor: Optional[ExtractVariableGroupAndLevel],
) -> ExtractVariableGroupAndLevel:
    return metadata_extractor or ExtractVariableGroupAndLevel({"default": "sfc"})


# --------------------------------------------------------------------------
# grid-dim scalers (graph node attributes)
# --------------------------------------------------------------------------


@scaler_registry.register("GraphNodeAttributeScaler")
def graph_node_attribute_scaler(
    *,
    graph: Graph,
    nodes_name: str = "data",
    attribute_name: str = "area_weight",
    inverse: bool = False,
    norm: Optional[str] = "unit-sum",
    **_,
) -> Tuple[Tuple[str, ...], np.ndarray]:
    w = np.asarray(graph[nodes_name].attributes[attribute_name], dtype=np.float32).reshape(-1)
    if inverse:
        w = (~w.astype(bool)).astype(np.float32)
    return ("grid",), _apply_norm(w, norm)


@scaler_registry.register("ReweightedGraphNodeAttributeScaler")
def reweighted_graph_node_attribute_scaler(
    *,
    graph: Graph,
    nodes_name: str = "data",
    attribute_name: str = "area_weight",
    scaling_mask_attribute_name: str,
    weight_frac_of_total: float,
    inverse: bool = False,
    norm: Optional[str] = "unit-sum",
    **_,
) -> Tuple[Tuple[str, ...], np.ndarray]:
    """Rescale the masked node subset so its weight sum equals
    ``weight_frac_of_total`` of the total (ref node_attributes.py:67-130);
    used to emphasise e.g. the LAM interior."""
    nodes = graph[nodes_name]
    w = np.asarray(nodes.attributes[attribute_name], dtype=np.float64).reshape(-1).copy()
    if scaling_mask_attribute_name not in nodes.attributes:
        bool_attrs = [
            k for k, v in nodes.attributes.items() if np.asarray(v).dtype == np.bool_
        ]
        raise KeyError(
            f"scaling_mask_attribute_name {scaling_mask_attribute_name!r} not found in graph"
            f" - available boolean node attributes: {bool_attrs}"
        )
    mask = np.asarray(nodes.attributes[scaling_mask_attribute_name]).reshape(-1).astype(bool)
    if inverse:
        mask = ~mask
    if not 0.0 < weight_frac_of_total < 1.0:
        raise ValueError("weight_frac_of_total must be in (0, 1)")
    unmasked_sum = w[~mask].sum()
    n_masked = int(mask.sum())
    if n_masked:
        w[mask] = weight_frac_of_total / (1.0 - weight_frac_of_total) * unmasked_sum / n_masked
    return ("grid",), _apply_norm(w.astype(np.float32), norm)


# --------------------------------------------------------------------------
# variable-dim scalers
# --------------------------------------------------------------------------


@scaler_registry.register("GeneralVariableLossScaler")
def general_variable_scaler(
    *,
    data_indices: IndexCollection,
    weights: Optional[Dict[str, float]] = None,
    default: float = 1.0,
    metadata_extractor: Optional[ExtractVariableGroupAndLevel] = None,
    norm: Optional[str] = None,
    **_,
) -> Tuple[Tuple[str, ...], np.ndarray]:
    """Per-variable weights in model-output order; 'param' keys match all
    levels of that parameter (e.g. 'q' matches q_850); ref variable.py:53."""
    weights = dict(weights or {})
    default = float(weights.pop("default", default))
    ex = _extractor(metadata_extractor)
    names = data_indices.model.output.ordered_names
    out = np.full(len(names), default, dtype=np.float32)
    for i, name in enumerate(names):
        param = ex.get_param(name)
        if name in weights:
            out[i] = weights[name]
        elif param in weights:
            out[i] = weights[param]
    return ("variable",), _apply_norm(out, norm)


@scaler_registry.register("VariableMaskingLossScaler")
def variable_masking_scaler(
    *,
    data_indices: IndexCollection,
    variables: List[str],
    invert: bool = False,
    metadata_extractor: Optional[ExtractVariableGroupAndLevel] = None,
    norm: Optional[str] = None,
    **_,
) -> Tuple[Tuple[str, ...], np.ndarray]:
    """Zero the listed variables in the loss (or with invert=True keep ONLY
    them); ref variable_masking.py:22."""
    weights = dict.fromkeys(variables, 0.0 if not invert else 1.0)
    return general_variable_scaler(
        data_indices=data_indices,
        weights=weights,
        default=1.0 if not invert else 0.0,
        metadata_extractor=metadata_extractor,
        norm=norm,
    )


def _level_scaler(kind: str):
    def build(
        *,
        data_indices: IndexCollection,
        slope: float = 0.001,
        y_intercept: float = 0.2,
        group: Optional[str] = None,
        metadata_extractor: Optional[ExtractVariableGroupAndLevel] = None,
        norm: Optional[str] = None,
        **_,
    ) -> Tuple[Tuple[str, ...], np.ndarray]:
        ex = _extractor(metadata_extractor)
        names = data_indices.model.output.ordered_names
        out = np.ones(len(names), dtype=np.float32)
        for i, name in enumerate(names):
            vgroup, _, level = ex.get_group_and_level(name)
            if group is not None:
                # reference semantics (variable_level.py:76-95): scale exactly
                # the configured group; a grouped variable must carry a level
                if vgroup != group:
                    continue
                if kind != "none" and level is None:
                    raise ValueError(f"Variable {name} in group {group!r} has no level to scale.")
            elif level is None:
                continue  # ungrouped config: surface variables keep weight 1
            if kind == "linear":
                out[i] = level * slope + y_intercept
            elif kind == "relu":
                out[i] = max(y_intercept, level * slope)
            elif kind == "poly":
                out[i] = (slope * level) ** 2 + y_intercept
            # kind == "none": constant 1.0 (NoVariableLevelScaler)
        return ("variable",), _apply_norm(out, norm)

    return build


scaler_registry.register("LinearVariableLevelScaler")(_level_scaler("linear"))
scaler_registry.register("ReluVariableLevelScaler")(_level_scaler("relu"))
scaler_registry.register("PolynomialVariableLevelScaler")(_level_scaler("poly"))
scaler_registry.register("NoVariableLevelScaler")(_level_scaler("none"))


def _tendency_scaler(kind: str):
    def build(
        *,
        data_indices: IndexCollection,
        statistics_tendencies: Optional[Dict[str, np.ndarray]] = None,
        statistics: Optional[Dict[str, np.ndarray]] = None,
        norm: Optional[str] = None,
        **_,
    ) -> Tuple[Tuple[str, ...], np.ndarray]:
        """stdev: state_std/tendency_std, var: the squares; per prognostic
        model-output variable, in normalised units (ref variable_tendency.py)."""
        names = data_indices.model.output.ordered_names
        out = np.ones(len(names), dtype=np.float32)
        if kind != "none" and statistics_tendencies is not None and statistics is not None:
            t_std = np.asarray(statistics_tendencies["stdev"], dtype=np.float64)
            s_std = np.asarray(statistics["stdev"], dtype=np.float64)
            for i, name in enumerate(names):
                j = data_indices.name_to_index[name]
                if t_std[j] > 0:
                    r = float(s_std[j] / t_std[j])
                    out[i] = r if kind == "stdev" else r * r
        return ("variable",), _apply_norm(out, norm)

    return build


scaler_registry.register("NoTendencyScaler")(_tendency_scaler("none"))
scaler_registry.register("StdevTendencyScaler")(_tendency_scaler("stdev"))
scaler_registry.register("VarTendencyScaler")(_tendency_scaler("var"))
scaler_registry.register("TendencyScaler")(_tendency_scaler("stdev"))  # legacy name


# --------------------------------------------------------------------------
# time-dim scalers
# --------------------------------------------------------------------------


@scaler_registry.register("TimeStepScaler")
def time_step_scaler(
    *,
    n_steps: int = 1,
    gamma: Optional[float] = None,
    weights: Optional[List[float]] = None,
    norm: Optional[str] = None,
    **_,
):
    """Explicit per-output-step weights (ref time_step.py:21); the legacy
    ``gamma`` form w_t = gamma^t is kept for old configs."""
    if weights is not None:
        w = np.asarray(weights, dtype=np.float32)
    else:
        w = (float(gamma if gamma is not None else 1.0) ** np.arange(n_steps)).astype(np.float32)
    return ("time",), _apply_norm(w, norm)


@scaler_registry.register("UniformTimeStepScaler")
def uniform_time_step_scaler(*, n_steps: int = 1, **_):
    """Uniform weights normalised to unit sum (ref time_step.py:51)."""
    return ("time",), np.full(n_steps, 1.0 / n_steps, dtype=np.float32)


@scaler_registry.register("LeadTimeDecayScaler")
def lead_time_decay_scaler(
    *,
    output_lead_times: List[int],
    decay_factor: float,
    max_lead_time: int,
    decay_type: str = "linear",
    inverse: bool = False,
    norm: Optional[str] = None,
    **_,
):
    """Decay (or with inverse=True, grow) the weight with lead time,
    normalised to unit sum (ref time_step.py:76-144)."""
    if decay_type not in ("exponential", "linear"):
        raise ValueError(f"decay_type {decay_type!r} not supported")
    t = np.asarray(output_lead_times, dtype=np.float64) / float(max_lead_time)
    if decay_type == "exponential":
        w = np.exp(-decay_factor * t)
        w_inv = 1.0 - np.exp(-decay_factor * t)
    else:
        w = 1.0 - decay_factor * t
        w_inv = decay_factor * t
    w = w_inv if inverse else w
    w = (w / w.sum()).astype(np.float32)
    return ("time",), _apply_norm(w, norm)


# --------------------------------------------------------------------------
# spectral-dim scaler
# --------------------------------------------------------------------------


@scaler_registry.register("SpectralDimensionScaler")
def spectral_dimension_scaler(
    *,
    n_spectral_modes: int,
    spectral_dims: Optional[int] = None,
    norm: Optional[str] = None,
    **_,
):
    """Uniform 1/n_spectral_modes over the spectral dimension that replaces
    the grid dim inside spectral losses (ref scalers/spectral.py:21-79)."""
    n = int(spectral_dims if spectral_dims is not None else n_spectral_modes)
    w = np.full(n, 1.0 / float(n_spectral_modes), dtype=np.float32)
    return ("grid",), _apply_norm(w, norm)


def create_scalers(
    configs: Optional[Dict[str, dict]],
    *,
    graph: Optional[Graph] = None,
    data_indices: Optional[IndexCollection] = None,
    statistics: Optional[Dict[str, np.ndarray]] = None,
    statistics_tendencies: Optional[Dict[str, np.ndarray]] = None,
    variable_groups: Optional[Dict[str, object]] = None,
    metadata_variables: Optional[Dict[str, dict]] = None,
) -> Dict[str, Tuple[Tuple[str, ...], np.ndarray]]:
    """Build every configured scaler (ref scalers/scalers.py create_scalers).

    ``variable_groups`` (config ``training.variable_groups``) and the
    dataset's ``metadata_variables`` feed the shared group/level extractor
    handed to each variable scaler (ref train/methods/base.py metadata_extractor).
    """
    extractor = ExtractVariableGroupAndLevel(
        variable_groups or {"default": "sfc"}, metadata_variables
    )
    out: Dict[str, Tuple[Tuple[str, ...], np.ndarray]] = {}
    for name, cfg in (configs or {}).items():
        if cfg is None:  # a preset nulling out an inherited default scaler
            continue
        out[name] = scaler_registry.build_from_config(
            dict(cfg),
            graph=graph,
            data_indices=data_indices,
            statistics=statistics,
            statistics_tendencies=statistics_tendencies,
            metadata_extractor=extractor,
        )
    return out

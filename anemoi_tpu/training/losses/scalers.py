"""Loss-weight scaler builders.

Equivalents of /root/reference/training/src/anemoi/training/losses/scalers/*:
- GraphNodeAttributeScaler (node_attributes.py:24): grid weights from a graph
  node attribute (area weights)
- GeneralVariableLossScaler (variable.py): per-variable weights from config
- Linear/Relu/Polynomial/No VariableLevelScaler (variable_level.py:97-142):
  pressure-level weighting parsed from "param_level" variable names
- TendencyScaler (variable_tendency.py): weights from tendency statistics

`create_scalers` builds the named dict consumed by `get_loss_function`.
Each scaler is (dims tuple, numpy array).
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Tuple

import numpy as np

from anemoi_tpu.data_indices.collection import IndexCollection
from anemoi_tpu.graphs.graph import Graph
from anemoi_tpu.utils.registry import Registry

scaler_registry = Registry("loss scaler")

LEVEL_RE = re.compile(r"^(?P<param>.+?)_(?P<level>\d+)$")


def split_variable_name(name: str) -> Tuple[str, Optional[int]]:
    m = LEVEL_RE.match(name)
    if m:
        return m.group("param"), int(m.group("level"))
    return name, None


@scaler_registry.register("GraphNodeAttributeScaler")
def graph_node_attribute_scaler(
    *,
    graph: Graph,
    nodes_name: str = "data",
    attribute_name: str = "area_weight",
    norm: Optional[str] = "unit-sum",
    **_,
) -> Tuple[Tuple[str, ...], np.ndarray]:
    w = np.asarray(graph[nodes_name].attributes[attribute_name], dtype=np.float32).reshape(-1)
    if norm in ("unit-sum", "l1"):
        w = w / w.sum()
    elif norm == "unit-max":
        w = w / w.max()
    return ("grid",), w


@scaler_registry.register("GeneralVariableLossScaler")
def general_variable_scaler(
    *,
    data_indices: IndexCollection,
    weights: Optional[Dict[str, float]] = None,
    default: float = 1.0,
    **_,
) -> Tuple[Tuple[str, ...], np.ndarray]:
    """Per-variable weights in model-output order; 'param' keys match all
    levels of that parameter (e.g. 'q' matches q_850)."""
    weights = dict(weights or {})
    names = data_indices.model.output.ordered_names
    out = np.full(len(names), default, dtype=np.float32)
    for i, name in enumerate(names):
        param, _ = split_variable_name(name)
        if name in weights:
            out[i] = weights[name]
        elif param in weights:
            out[i] = weights[param]
    return ("variable",), out


def _level_scaler(kind: str):
    def build(
        *,
        data_indices: IndexCollection,
        slope: float = 0.001,
        y_intercept: float = 0.2,
        **_,
    ) -> Tuple[Tuple[str, ...], np.ndarray]:
        names = data_indices.model.output.ordered_names
        out = np.ones(len(names), dtype=np.float32)
        for i, name in enumerate(names):
            _, level = split_variable_name(name)
            if level is None:
                continue  # surface variables: weight 1
            if kind == "linear":
                out[i] = level * slope + y_intercept
            elif kind == "relu":
                out[i] = max(y_intercept, level * slope)
            elif kind == "poly":
                out[i] = (slope * level) ** 2 + y_intercept
        return ("variable",), out

    return build


scaler_registry.register("LinearVariableLevelScaler")(_level_scaler("linear"))
scaler_registry.register("ReluVariableLevelScaler")(_level_scaler("relu"))
scaler_registry.register("PolynomialVariableLevelScaler")(_level_scaler("poly"))


@scaler_registry.register("TendencyScaler")
def tendency_scaler(
    *,
    data_indices: IndexCollection,
    statistics_tendencies: Optional[Dict[str, np.ndarray]] = None,
    statistics: Optional[Dict[str, np.ndarray]] = None,
    **_,
) -> Tuple[Tuple[str, ...], np.ndarray]:
    """1 / tendency-stdev per model-output variable (in normalised units:
    tendency_std / state_std), ref variable_tendency.py."""
    names = data_indices.model.output.ordered_names
    out = np.ones(len(names), dtype=np.float32)
    if statistics_tendencies is not None and statistics is not None:
        t_std = np.asarray(statistics_tendencies["stdev"], dtype=np.float64)
        s_std = np.asarray(statistics["stdev"], dtype=np.float64)
        for i, name in enumerate(names):
            j = data_indices.name_to_index[name]
            if t_std[j] > 0:
                out[i] = float(s_std[j] / t_std[j])
    return ("variable",), out


@scaler_registry.register("TimeStepScaler")
def time_step_scaler(*, n_steps: int = 1, gamma: float = 1.0, **_):
    """Down-weight later rollout steps: w_t = gamma^t (ref time_step.py)."""
    return ("time",), (gamma ** np.arange(n_steps)).astype(np.float32)


def create_scalers(
    configs: Optional[Dict[str, dict]],
    *,
    graph: Optional[Graph] = None,
    data_indices: Optional[IndexCollection] = None,
    statistics: Optional[Dict[str, np.ndarray]] = None,
    statistics_tendencies: Optional[Dict[str, np.ndarray]] = None,
) -> Dict[str, Tuple[Tuple[str, ...], np.ndarray]]:
    """Build every configured scaler (ref scalers/scalers.py create_scalers)."""
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
        )
    return out

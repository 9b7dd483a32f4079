"""Output masks for limited-area / stretched-grid training.

Equivalent of /root/reference/training/src/anemoi/training/utils/masks.py
(Boolean1DMask :47, NoOutputMask :157): for LAM configs the model is scored
only inside the area of interest, and during autoregressive rollout the
boundary nodes are re-forced from the (global) truth instead of the model's
own prediction (ref tasks/forecaster.py advance_input boundary handling).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from anemoi_tpu.graphs.graph import Graph


class Boolean1DMask:
    """Grid-dim boolean mask from a graph node attribute."""

    def __init__(self, mask: np.ndarray):
        self.mask = np.asarray(mask).reshape(-1).astype(bool)

    @classmethod
    def from_graph(cls, graph: Graph, nodes_name: str, attribute_name: str) -> "Boolean1DMask":
        return cls(graph[nodes_name].attributes[attribute_name])

    def as_array(self) -> jnp.ndarray:
        return jnp.asarray(self.mask)

    def apply(self, x: jnp.ndarray, fill_value: float = 0.0) -> jnp.ndarray:
        """Zero (or fill) the masked-OUT region; grid is axis -2 of [..., G, V]."""
        return jnp.where(self.as_array()[:, None], x, fill_value)

    def rollout_boundary(self, pred: jnp.ndarray, truth: jnp.ndarray) -> jnp.ndarray:
        """Inside the area keep the prediction, outside force the truth."""
        return jnp.where(self.as_array()[:, None], pred, truth)

    def loss_scaler(self) -> np.ndarray:
        """Grid-dim loss weights (1 inside, 0 outside)."""
        return self.mask.astype(np.float32)


class NoOutputMask:
    def as_array(self):
        return None

    def apply(self, x, fill_value: float = 0.0):
        return x

    def rollout_boundary(self, pred, truth):
        return pred

    def loss_scaler(self):
        return None


def build_output_masks(
    config: Optional[Dict[str, dict]], graph: Graph
) -> Dict[str, Boolean1DMask]:
    """config: {dataset: {"nodes_name": ..., "attribute_name": ...}}"""
    out = {}
    for ds, cfg in (config or {}).items():
        out[ds] = Boolean1DMask.from_graph(
            graph, cfg.get("nodes_name", ds), cfg["attribute_name"]
        )
    return out

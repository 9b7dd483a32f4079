"""Trainable node attributes (flax.linen).

Equivalent of /root/reference/models/src/anemoi/models/layers/graph.py:20-120
(TrainableTensor, NamedNodesAttributes): per-node-set sin/cos coordinates plus
zero-initialised learned embeddings.
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def sincos_coordinates(coords: np.ndarray) -> np.ndarray:
    """[N, 2] (lat, lon) radians -> [N, 4] (sin lat, sin lon, cos lat, cos lon)."""
    return np.concatenate([np.sin(coords), np.cos(coords)], axis=-1).astype(np.float32)


class TrainableNodeAttributes(nn.Module):
    """Static sin/cos lat-lon features + trainable zero-init embedding for one
    node set.  The static features are baked in as a module constant (they are
    graph metadata, not parameters)."""

    num_nodes: int
    trainable_size: int

    @nn.compact
    def __call__(self, static_attrs: jnp.ndarray) -> jnp.ndarray:
        # static_attrs: [N, F] (sincos coords)
        if self.trainable_size > 0:
            trainable = self.param(
                "trainable",
                nn.initializers.zeros,
                (self.num_nodes, self.trainable_size),
                jnp.float32,
            )
            return jnp.concatenate([static_attrs, trainable.astype(static_attrs.dtype)], axis=-1)
        return static_attrs


def node_attribute_dims(
    num_coord_features: Dict[str, int], trainable: Dict[str, int]
) -> Dict[str, int]:
    """attr_ndims equivalent: sincos (2x coords) + trainable size per node set."""
    return {
        name: 2 * n + int(trainable.get(name, 0)) for name, n in num_coord_features.items()
    }

"""Variable remapping (e.g. direction angles -> cos/sin pairs).

Equivalent of /root/reference/models/src/anemoi/models/preprocessing/remapper.py:39
and mappings.py.  Round 1 implements the cos_sin mapping used for wind
direction; the remapper rewrites a variable into derived features before the
model and reconstructs it after."""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp


class CosSinRemapper:
    """Remap an angle variable (degrees) into cos/sin components.

    Unlike the reference (which expands the variable count and rewrites the
    index collection), round 1 keeps shapes fixed by remapping in place pairs
    declared as {"angle_var": ["cos_var", "sin_var"]} where the cos/sin
    variables already exist in the dataset layout."""

    def __init__(self, data_indices, config: Dict[str, list]) -> None:
        name_to_index = data_indices.name_to_index
        self.pairs = []
        for angle, (cos_name, sin_name) in (config or {}).items():
            self.pairs.append(
                (name_to_index[angle], name_to_index[cos_name], name_to_index[sin_name])
            )

    def transform(self, x: jnp.ndarray) -> jnp.ndarray:
        for angle_i, cos_i, sin_i in self.pairs:
            rad = jnp.deg2rad(x[..., angle_i])
            x = x.at[..., cos_i].set(jnp.cos(rad))
            x = x.at[..., sin_i].set(jnp.sin(rad))
        return x

    def inverse_transform(self, x: jnp.ndarray) -> jnp.ndarray:
        for angle_i, cos_i, sin_i in self.pairs:
            ang = jnp.rad2deg(jnp.arctan2(x[..., sin_i], x[..., cos_i]))
            x = x.at[..., angle_i].set(jnp.mod(ang, 360.0))
        return x

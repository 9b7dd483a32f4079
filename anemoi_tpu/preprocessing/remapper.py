"""Variable remapping (e.g. direction angles -> cos/sin pairs).

Equivalent of /root/reference/models/src/anemoi/models/preprocessing/remapper.py:39
and mappings.py.  Two forms:

- ``CosSinRemapper``: in-place mapping between variables that already exist in
  the dataset layout (shapes fixed).
- ``Remapper``: the reference's variable-EXPANDING form — each remapped
  variable is dropped from the layout and replaced by derived variables
  appended at the end; the ``IndexCollection`` and the dataset statistics are
  rewritten so the model and every downstream processor are built against the
  remapped space.  All tensor work is gather+concat (scatter-free, jit-safe).
"""

from __future__ import annotations

from typing import Dict, List

import jax.numpy as jnp
import numpy as np

from anemoi_tpu.data_indices.collection import IndexCollection


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


class Remapper:
    """Variable-expanding remapper (ref remapper.py:39 ``Remapper``).

    ``config`` maps mapping kind -> {source_var: [derived names...]}, e.g.::

        {"cos_sin": {"wdir10m": ["cos_wdir10m", "sin_wdir10m"]}}

    The remapped layout keeps all non-remapped variables in their original
    relative order and appends the derived variables at the end (matching the
    reference, which appends new entries to ``name_to_index``).  The source
    variable's role (forcing / diagnostic / target / prognostic) is inherited
    by every derived variable.

    Use :meth:`remap_index_collection` / :meth:`remap_statistics` at build
    time, then place the remapper FIRST in the processor chain: ``transform``
    consumes original data-space tensors, and (because ``Processors`` runs
    inverses in reverse order) ``inverse_transform`` runs last, converting the
    denormalised remapped output back to the original variable set.
    """

    MAPPINGS = ("cos_sin",)

    def __init__(self, data_indices: IndexCollection, config: Dict[str, Dict[str, List[str]]]) -> None:
        config = dict(config or {})
        for kind in config:
            if kind not in self.MAPPINGS:
                raise ValueError(f"Unknown remapper mapping '{kind}' (have {self.MAPPINGS})")
        cos_sin = dict(config.get("cos_sin", {}))
        self.src_indices = data_indices
        name_to_index = data_indices.name_to_index

        for src, derived in cos_sin.items():
            assert src in name_to_index, f"remapped variable '{src}' not in dataset"
            assert len(derived) == 2, f"cos_sin mapping for '{src}' needs [cos, sin] names"
            for d in derived:
                assert d not in name_to_index, f"derived name '{d}' already exists"

        remapped_names = list(cos_sin)
        kept_names = [n for n in name_to_index if n not in cos_sin]
        derived_names: List[str] = []
        # (source data index, 0=cos / 1=sin) per appended column, in order
        self._derived_spec: List[tuple] = []
        for src in remapped_names:
            cos_name, sin_name = cos_sin[src]
            derived_names.extend([cos_name, sin_name])
            self._derived_spec.append((name_to_index[src], 0))
            self._derived_spec.append((name_to_index[src], 1))

        new_name_to_index = {n: i for i, n in enumerate(kept_names + derived_names)}

        def _remap_role(role: List[str]) -> List[str]:
            out: List[str] = []
            for n in role:
                out.extend(cos_sin[n] if n in cos_sin else [n])
            return out

        self.data_indices = IndexCollection(
            new_name_to_index,
            forcing=_remap_role(data_indices.forcing),
            diagnostic=_remap_role(data_indices.diagnostic),
            target=_remap_role(data_indices.target),
        )
        self._keep_idx = jnp.asarray([name_to_index[n] for n in kept_names], dtype=jnp.int32)
        self._keep_idx_np = np.asarray([name_to_index[n] for n in kept_names])

        # --- inverse gather tables, one per output space -----------------
        def _inverse_tables(src_space, dst_space):
            """Per original-output-variable recipe against the remapped space.

            Scatter-free: angle columns are computed, appended after the
            remapped tensor, and the final layout is a single gather whose
            table points either into the remapped tensor (< width) or into
            the appended angle block (>= width)."""
            dst_pos = {n: i for i, n in enumerate(dst_space.ordered_names)}
            width = len(dst_space.ordered_names)
            gather, angle = [], []  # angle: (cos pos, sin pos) per appended col
            for n in src_space.ordered_names:
                if n in cos_sin:
                    cos_name, sin_name = cos_sin[n]
                    gather.append(width + len(angle))
                    angle.append((dst_pos[cos_name], dst_pos[sin_name]))
                else:
                    gather.append(dst_pos[n])
            return jnp.asarray(gather, dtype=jnp.int32), angle

        self._inv_model = _inverse_tables(
            data_indices.model.output, self.data_indices.model.output
        )
        self._inv_data = _inverse_tables(
            data_indices.data.output, self.data_indices.data.output
        )
        self._n_model_out = len(self.data_indices.model.output.ordered_names)
        self._n_data_out = len(self.data_indices.data.output.ordered_names)

    # --- statistics ----------------------------------------------------
    def remap_statistics(self, statistics: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        """Expand per-variable statistic vectors into the remapped layout.

        Derived cos/sin columns get (min, max, mean, stdev) = (-1, 1, 0, 1)
        so a downstream mean-std/min-max normaliser leaves them untouched."""
        derived_stats = {"minimum": -1.0, "maximum": 1.0, "mean": 0.0, "stdev": 1.0}
        n_derived = len(self._derived_spec)
        out = {}
        for key, vec in statistics.items():
            vec = np.asarray(vec)
            if vec.ndim != 1 or vec.shape[0] != len(self.src_indices.name_to_index):
                out[key] = vec  # non per-variable entry: pass through
                continue
            fill = derived_stats.get(key, 0.0)
            out[key] = np.concatenate(
                [vec[self._keep_idx_np], np.full(n_derived, fill, dtype=vec.dtype)]
            )
        return out

    # --- forward -------------------------------------------------------
    def transform(self, x: jnp.ndarray) -> jnp.ndarray:
        """Original data-space [..., V] -> remapped data-space [..., V']."""
        assert x.shape[-1] == len(self.src_indices.name_to_index), (
            f"Remapper.transform expects full data space "
            f"({len(self.src_indices.name_to_index)} vars), got {x.shape[-1]}"
        )
        cols = [jnp.take(x, self._keep_idx, axis=-1)]
        for src_i, kind in self._derived_spec:
            rad = jnp.deg2rad(x[..., src_i : src_i + 1])
            cols.append(jnp.cos(rad) if kind == 0 else jnp.sin(rad))
        return jnp.concatenate(cols, axis=-1)

    # --- inverse -------------------------------------------------------
    def inverse_transform(self, y: jnp.ndarray) -> jnp.ndarray:
        """Remapped output space -> original output space (angle rebuilt).

        Accepts the remapped model-output or data-output width; dispatches on
        the trailing dimension like the normaliser."""
        if y.shape[-1] == self._n_model_out:
            gather, angle = self._inv_model
        elif y.shape[-1] == self._n_data_out:
            gather, angle = self._inv_data
        else:
            raise ValueError(
                f"Remapper.inverse_transform: unexpected width {y.shape[-1]} "
                f"(model out {self._n_model_out}, data out {self._n_data_out})"
            )
        if angle:
            cos_idx = jnp.asarray([c for c, _ in angle], dtype=jnp.int32)
            sin_idx = jnp.asarray([s for _, s in angle], dtype=jnp.int32)
            ang = jnp.rad2deg(
                jnp.arctan2(jnp.take(y, sin_idx, axis=-1), jnp.take(y, cos_idx, axis=-1))
            )
            y = jnp.concatenate([y, jnp.mod(ang, 360.0)], axis=-1)
        return jnp.take(y, gather, axis=-1)

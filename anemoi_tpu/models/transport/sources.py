"""Source-field construction for interpolant training and sampling.

Equivalent of /root/reference/models/src/anemoi/models/transport/sources.py:
the stochastic-interpolant bridge transports a SOURCE distribution to the
target; supported kinds are ``zero`` (deterministic zero field), ``gaussian``
(grid-consistent noise, random_fields.py), and ``reference_state`` (the latest
input state restricted to model-output variables, ref sources.py:31-56).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from anemoi_tpu.models.transport.random_fields import randn_grid_sharded

TRANSPORT_SOURCE_KINDS = frozenset({"zero", "gaussian", "reference_state"})


@dataclass(frozen=True)
class SourceSpec:
    """Shape/dtype of one dataset's source field (ref sources.py:59-76)."""

    shape: Tuple[int, ...]
    dtype: object = jnp.float32

    @classmethod
    def from_tensor(cls, x: jnp.ndarray) -> "SourceSpec":
        return cls(shape=tuple(x.shape), dtype=x.dtype)


def sampling_source_specs(
    x: Dict[str, jnp.ndarray],
    *,
    n_step_output: int,
    num_output_channels: Dict[str, int],
) -> Dict[str, SourceSpec]:
    """Target-shaped specs inferred from the sampling input batch
    (ref sources.py:79-101): [B, n_step_output, E, G, V_out]."""
    return {
        ds: SourceSpec(
            shape=(
                xd.shape[0],
                n_step_output,
                xd.shape[2],
                xd.shape[-2],
                num_output_channels[ds],
            ),
            dtype=xd.dtype,
        )
        for ds, xd in x.items()
    }


def reference_state_source(
    x: Dict[str, jnp.ndarray],
    *,
    data_indices: Dict[str, object],
    n_step_output: int,
) -> Dict[str, jnp.ndarray]:
    """Latest input state, restricted to model-output variables
    (ref sources.py:31-56).  Requires every output variable to exist in the
    model input (i.e. no diagnostic-only outputs)."""
    sources = {}
    for ds, xd in x.items():
        idx = data_indices[ds]
        out_names = [
            n for n, _ in sorted(
                idx.model.output.name_to_index.items(), key=lambda kv: kv[1]
            )
        ]
        in_n2i = idx.model.input.name_to_index
        missing = [n for n in out_names if n not in in_n2i]
        if missing:
            raise ValueError(
                "reference_state transport sources need every model-output "
                f"variable in the model input; missing {missing} for '{ds}'. "
                "Choose a non-reference source instead."
            )
        pos = jnp.asarray([in_n2i[n] for n in out_names], jnp.int32)
        source = jnp.take(xd[:, -1:], pos, axis=-1)
        if n_step_output > 1:
            source = jnp.broadcast_to(
                source, source.shape[:1] + (n_step_output,) + source.shape[2:]
            )
        sources[ds] = source
    return sources


def build_sources(
    kind: str,
    key: jax.Array,
    specs: Dict[str, SourceSpec],
    *,
    x: Optional[Dict[str, jnp.ndarray]] = None,
    data_indices: Optional[Dict[str, object]] = None,
    n_step_output: int = 1,
    shard_kwargs: Optional[dict] = None,
) -> Dict[str, jnp.ndarray]:
    """Create one source field per dataset (ref sources.py:104-180)."""
    if kind not in TRANSPORT_SOURCE_KINDS:
        raise ValueError(
            f"Unknown transport source '{kind}'; expected one of "
            f"{sorted(TRANSPORT_SOURCE_KINDS)}"
        )
    if kind == "zero":
        return {ds: jnp.zeros(sp.shape, sp.dtype) for ds, sp in specs.items()}
    if kind == "gaussian":
        keys = jax.random.split(key, len(specs))
        return {
            ds: randn_grid_sharded(k, sp.shape, sp.dtype, **(shard_kwargs or {}))
            for k, (ds, sp) in zip(keys, sorted(specs.items()))
        }
    assert kind == "reference_state"
    if x is None or data_indices is None:
        raise ValueError("reference_state sources need the input batch and indices")
    return reference_state_source(
        x, data_indices=data_indices, n_step_output=n_step_output
    )

"""Device mesh construction and sharding helpers.

TPU-native replacement for the reference's flat process-group arithmetic
(/root/reference/training/src/anemoi/training/distributed/groups.py and
strategy.py, SURVEY.md §2.3): a single `jax.sharding.Mesh` with named axes

    data     -- data parallelism (batch axis; DDP-group equivalent)
    model    -- model/sequence parallelism (grid + hidden node axes;
                model_comm_group equivalent)
    ensemble -- ensemble parallelism (ens_comm_group equivalent)

World factorisation W = data x model x ensemble mirrors
``model_comm_num_groups x num_gpus_per_model (x ens factor)``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclass(frozen=True)
class MeshSpec:
    data: int = 1
    model: int = 1
    ensemble: int = 1

    @property
    def world(self) -> int:
        return self.data * self.model * self.ensemble

    @classmethod
    def from_config(cls, config: dict, num_devices: Optional[int] = None) -> "MeshSpec":
        """Derive the mesh from config (num_gpus_per_model equivalent)."""
        n = num_devices if num_devices is not None else len(jax.devices())
        model = int(config.get("num_devices_per_model", 1))
        ensemble = int(config.get("num_devices_per_ensemble", 1))
        assert n % (model * ensemble) == 0, (
            f"{n} devices not divisible by model({model}) x ensemble({ensemble})"
        )
        return cls(data=n // (model * ensemble), model=model, ensemble=ensemble)


def create_mesh(spec: MeshSpec, devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if len(devices) < spec.world:
        raise ValueError(
            f"mesh spec needs {spec.world} devices (data={spec.data} x "
            f"model={spec.model} x ensemble={spec.ensemble}) but only "
            f"{len(devices)} are visible; set hardware.num_devices to the "
            "available count or run with "
            "hardware.platform=cpu + hardware.num_virtual_devices=N"
        )
    arr = np.asarray(devices[: spec.world]).reshape(
        spec.data, spec.model, spec.ensemble
    )
    return Mesh(arr, axis_names=("data", "model", "ensemble"))


def batch_sharding(mesh: Mesh, shard_grid: bool = True) -> NamedSharding:
    """Sharding for [B, T, E, G, V] batches: batch over 'data', grid over
    'model' (reader-group-style sharded loading).  The batch's E axis is
    always 1 (single truth); ensemble members are tiled INSIDE the step and
    sharded over 'ensemble' there (training/step.py)."""
    grid_axis = "model" if shard_grid else None
    return NamedSharding(mesh, P("data", None, None, grid_axis, None))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(mesh: Mesh, params):
    """Replicate parameters across the mesh (DDP-style; FSDP comes later)."""
    return jax.device_put(params, replicate(mesh))


def zero_sharding(mesh: Mesh, tree, axis: str = "data"):
    """ZeRO-1-style optimizer-state sharding: each array whose FIRST axis is
    divisible by the ``axis`` mesh size shards that axis; everything else
    replicates.  The reference exposes this as the ZeroRedundancyOptimizer
    config (training/config/training/optimization/optimizer/zero.yaml) over
    DDP; here GSPMD keeps the update math unchanged -- XLA all-gathers shards
    where the (param, grad) consumers need them and the per-device optimizer
    state footprint drops ~1/n."""
    n = int(mesh.shape[axis]) if axis in mesh.axis_names else 1

    def spec_for(x):
        shape = getattr(x, "shape", ())
        if n > 1 and len(shape) >= 1 and shape[0] % n == 0 and shape[0] > 0:
            return NamedSharding(mesh, P(axis))
        return replicate(mesh)

    return jax.tree_util.tree_map(spec_for, tree)


def shard_opt_state(mesh: Mesh, state, axis: str = "data"):
    """Apply :func:`zero_sharding` to a TrainState's optimizer state."""
    placed = jax.device_put(
        state.opt_state, zero_sharding(mesh, state.opt_state, axis=axis)
    )
    return state.replace(opt_state=placed)


def model_axis_size(axis: str = "model") -> int:
    """Size of the model-parallel mesh axis at trace time (1 when tracing
    without a mesh or when the ambient mesh lacks the axis)."""
    try:
        mesh = jax.sharding.get_abstract_mesh()
        if mesh is None or mesh.empty or axis not in mesh.axis_names:
            return 1
        return int(mesh.shape[axis])
    except Exception:
        return 1


def maybe_shard(x, spec: Sequence) -> "jax.Array":
    """`with_sharding_constraint` against the ambient mesh, or a no-op when
    tracing without a mesh (single-device tests) or when the mesh lacks the
    referenced axes.  Axis names in ``spec`` that aren't in the mesh are
    dropped (replicated)."""
    try:
        mesh = jax.sharding.get_abstract_mesh()
        if mesh is None or mesh.empty:
            return x
        names = set(mesh.axis_names)
        clean = tuple(s if (s is None or s in names) else None for s in spec)
        if all(s is None for s in clean):
            return x
        from jax.sharding import PartitionSpec as P

        return jax.lax.with_sharding_constraint(x, P(*clean))
    except Exception:
        return x

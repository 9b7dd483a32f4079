"""Multi-host execution: jax.distributed wiring + per-host data assembly.

Equivalent of the reference's multi-node machinery: process-group setup
(torch.distributed init in
/root/reference/training/src/anemoi/training/distributed/strategy.py:88-131),
reader groups where each rank loads only its slice of the batch/grid
(strategy.py:232-270, multidataset.py:344-366, groups.py:122-131).

TPU-native design: one `jax.distributed.initialize` per process makes
`jax.devices()` global across hosts, so the trainer's `Mesh` spans processes
with no further changes — XLA routes collectives over ICI/DCN.  Data loading
becomes: every process samples the SAME global anchor order (seeded), loads
only the (batch-row x grid-row) block its addressable devices own, and
`jax.make_array_from_process_local_data` assembles the global sharded batch.

Env contract (mirrors torchrun-style launchers):
  ANEMOI_TPU_COORDINATOR   host:port of process 0
  ANEMOI_TPU_NUM_PROCESSES total process count
  ANEMOI_TPU_PROCESS_ID    this process's rank
  ANEMOI_TPU_DISTRIBUTED=1 use jax.distributed auto-detection instead
                           (SLURM / TPU pod metadata)

CPU multi-process testing (the reference's gloo trick,
models/tests/distributed/distributed_runner.py:35-105): force platform cpu,
set XLA_FLAGS=--xla_force_host_platform_device_count=K per process, and the
gloo collectives implementation is selected automatically.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional, Tuple

import numpy as np

LOGGER = logging.getLogger(__name__)

ENV_COORDINATOR = "ANEMOI_TPU_COORDINATOR"
ENV_NUM_PROCESSES = "ANEMOI_TPU_NUM_PROCESSES"
ENV_PROCESS_ID = "ANEMOI_TPU_PROCESS_ID"
ENV_AUTO = "ANEMOI_TPU_DISTRIBUTED"

_initialized = False


def maybe_initialize() -> bool:
    """Initialise jax.distributed from the environment (idempotent).

    Must run before the JAX backend is touched (any `jax.devices()` call).
    Returns True when running multi-process.
    """
    global _initialized
    if _initialized:
        return True
    coord = os.environ.get(ENV_COORDINATOR)
    auto = os.environ.get(ENV_AUTO) == "1"
    if coord is None and not auto:
        return False

    import jax

    # CPU backend needs the gloo cross-process collectives implementation
    platform = str(jax.config.jax_platforms or "")
    if platform.startswith("cpu") or os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:  # older jaxlib: flag absent, gloo is the default
            pass

    if coord is not None:
        num_processes = int(os.environ[ENV_NUM_PROCESSES])
        process_id = int(os.environ[ENV_PROCESS_ID])
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=num_processes,
            process_id=process_id,
        )
    else:
        jax.distributed.initialize()  # SLURM / TPU-pod auto detection
    _initialized = True
    LOGGER.info(
        "jax.distributed initialised: process %d/%d, %d local of %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )
    return True


def is_multiprocess() -> bool:
    import jax

    return jax.process_count() > 1


def host_local_slices(sharding, global_shape: Tuple[int, ...]) -> Tuple[slice, ...]:
    """Per-dimension slices of the global array this process must provide to
    `jax.make_array_from_process_local_data`.

    The union of the addressable devices' shard indices per dimension;
    requires the process's block to be contiguous in every sharded dimension
    (true for meshes built from `jax.devices()` in default order, where each
    process's devices are consecutive).
    """
    amap = sharding.addressable_devices_indices_map(tuple(global_shape))
    ndim = len(global_shape)
    lows = [None] * ndim
    highs = [None] * ndim
    covered: list[set] = [set() for _ in range(ndim)]
    for idx in amap.values():
        for d in range(ndim):
            lo, hi, step = idx[d].indices(global_shape[d])
            assert step == 1
            covered[d].add((lo, hi))
            lows[d] = lo if lows[d] is None else min(lows[d], lo)
            highs[d] = hi if highs[d] is None else max(highs[d], hi)
    for d in range(ndim):
        spans = sorted(covered[d])
        total = sum(hi - lo for lo, hi in set(spans))
        # contiguity: distinct spans must tile [lows[d], highs[d]) exactly
        distinct = sorted(set(spans))
        pos = lows[d]
        for lo, hi in distinct:
            assert lo == pos, (
                f"process-local shards are non-contiguous in dim {d}: {distinct}"
            )
            pos = hi
    return tuple(slice(lo, hi) for lo, hi in zip(lows, highs))


def make_global_array(local: np.ndarray, sharding, global_shape: Tuple[int, ...]):
    """Assemble a global sharded jax.Array from this process's local block
    (the reference's keep-batch-sharded reader-group path, methods/base.py:889)."""
    import jax

    if jax.process_count() == 1:
        return jax.device_put(local, sharding)
    return jax.make_array_from_process_local_data(
        sharding, np.ascontiguousarray(local), tuple(global_shape)
    )


def make_global_batch(
    batch_np: Dict[str, np.ndarray],
    sharding,
    global_shapes: Dict[str, Tuple[int, ...]],
):
    """Per-dataset `make_global_array`."""
    return {
        name: make_global_array(arr, sharding, global_shapes[name])
        for name, arr in batch_np.items()
    }


def fetch_replicated(tree):
    """Host (numpy) copy of a possibly multi-host-sharded pytree, identical
    on every process.  Collective when multi-process — every process must
    call it (checkpointing: materialise first, then let process 0 write)."""
    import jax

    if jax.process_count() == 1:
        return jax.device_get(tree)
    from jax.experimental import multihost_utils

    def fetch(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return multihost_utils.process_allgather(x, tiled=True)
        return np.asarray(x)

    return jax.tree_util.tree_map(fetch, tree)


def local_batch_plan(
    sharding, global_shapes: Dict[str, Tuple[int, ...]]
) -> Dict[str, Tuple[slice, ...]]:
    """Which (batch, time, ens, grid, var) block each dataset's loader should
    read on this process.  Single-process: everything."""
    import jax

    if jax.process_count() == 1:
        return {
            name: tuple(slice(0, s) for s in shape)
            for name, shape in global_shapes.items()
        }
    return {
        name: host_local_slices(sharding, shape)
        for name, shape in global_shapes.items()
    }

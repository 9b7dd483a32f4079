"""Compile-time weak-scaling checks on the virtual mesh.

Real multi-chip hardware is unavailable in CI, so scaling efficiency is
checked at the XLA level: lower the FULL sharded train step (edges-strategy
halo model parallelism) for growing model-shard counts at fixed problem size
and assert per-device work shrinks accordingly.  cost_analysis() reports the
per-device SPMD module, so flops(n shards) should fall ~1/n -- a stalled
partition (XLA silently all-gathering everything) would show flat per-device
flops and fail here.  (BASELINE.md scaling-efficiency target; runtime
efficiency on hardware is measured by bench.py.)"""

import numpy as np
import pytest

import jax
from jax.sharding import NamedSharding, PartitionSpec as P


def _lower_sharded_step(n_model: int):
    from __graft_entry__ import _build_interface
    from anemoi_tpu.parallel.mesh import MeshSpec, batch_sharding, create_mesh
    from anemoi_tpu.training.losses import get_loss_function
    from anemoi_tpu.training.optimizers import build_optimizer
    from anemoi_tpu.training.step import TrainState, make_step_fns

    spec = MeshSpec(data=1, model=n_model, ensemble=1)
    mesh = create_mesh(spec, jax.devices()[:n_model])
    iface, graph = _build_interface(
        grid="o16", mesh_resolution=2, num_channels=16, num_layers=2,
        num_heads=4, shard_strategy="edges", num_model_shards=n_model,
    )
    n_grid = graph["data"].num_nodes
    n_vars = iface.data_indices["data"].num_data_vars
    window = iface.model.n_step_input + 1
    losses = {"data": get_loss_function({"name": "WeightedMSELoss", "scalers": []}, {})}
    tx = build_optimizer({"lr": {"rate": 1e-4, "warmup": 1, "iterations": 10}})

    with jax.set_mesh(mesh):
        params = iface.init_params(batch_size=1)
        state = TrainState.create(params, tx)
        state = jax.device_put(state, NamedSharding(mesh, P()))
        train_step, _ = make_step_fns(iface, losses, rollout=1, remat_rollout=False)
        rng = np.random.default_rng(0)
        batch = {
            "data": jax.device_put(
                rng.normal(size=(1, window, 1, n_grid, n_vars)).astype(np.float32),
                batch_sharding(mesh, shard_grid=n_model > 1),
            )
        }
        jitted = train_step.jitted
        compiled = jitted.lower(state, batch, *train_step.bound_args).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):  # older jax returns one dict per device
            cost = cost[0]
        # run it too: the lowering must execute, not just compile
        new_state, metrics = train_step(state, batch)
        assert np.isfinite(float(metrics["loss"]))
    return float(cost.get("flops", 0.0))


@pytest.mark.slow
def test_halo_step_per_device_flops_shrink():
    flops = {n: _lower_sharded_step(n) for n in (1, 2, 4)}
    assert flops[1] > 0
    # per-device work must actually partition: ideal 1/n; demand >= 55% of it
    # (a replicated/all-gathered program would stay ~flat)
    assert flops[2] < flops[1] / (2 * 0.55), flops
    assert flops[4] < flops[1] / (4 * 0.55), flops
    eff_4 = flops[1] / (4 * flops[4])
    print(f"virtual-mesh weak-scaling flops efficiency at 4 shards: {eff_4:.2f}")

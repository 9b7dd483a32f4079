"""Ensemble model + CRPS training tests (mirrors the reference's
ensemble_crps integration flavour at CPU scale)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from anemoi_tpu.models.interface import AnemoiModelInterface
from tests.test_models import make_indices, make_statistics


def ens_interface(tiny_graph, injector="NoiseConditioning"):
    cfg = {
        "name": "AnemoiEnsModelEncProcDec",
        "num_channels": 16,
        "n_step_input": 2,
        "n_step_output": 1,
        "trainable_parameters": {"data": 2, "hidden": 2},
        "noise_injector": {"name": injector, "noise_std": 1.0,
                           "noise_channels_dim": 4, "noise_mlp_hidden_dim": 8},
        "encoder": {"name": "GNNForwardMapper"},
        "processor": {"name": "GraphTransformerProcessor", "num_layers": 2,
                      "num_heads": 4, "mlp_hidden_ratio": 2.0,
                      "conditional": injector == "NoiseConditioning"},
        "decoder": {"name": "GNNBackwardMapper"},
    }
    return AnemoiModelInterface(
        config={"model": cfg, "data": {"processors": []}},
        graph=tiny_graph,
        data_indices={"data": make_indices()},
        statistics={"data": make_statistics()},
    )


def test_noise_injector_members_differ(tiny_graph, rng):
    iface = ens_interface(tiny_graph, "NoiseInjector")
    params = iface.init_params(jax.random.PRNGKey(0))
    n_grid = tiny_graph["data"].num_nodes
    m = 3
    x1 = rng.normal(size=(1, 2, 1, n_grid, 5)).astype(np.float32)
    x = {"data": jnp.broadcast_to(jnp.asarray(x1), (1, 2, m, n_grid, 5))}
    out = iface.apply(params, x, rng=jax.random.PRNGKey(7))
    assert out["data"].shape == (1, 1, m, n_grid, 4)
    members = np.asarray(out["data"])[0, 0]
    # different noise per member -> different outputs
    assert not np.allclose(members[0], members[1])
    assert not np.allclose(members[1], members[2])
    # same rng -> reproducible
    out2 = iface.apply(params, x, rng=jax.random.PRNGKey(7))
    np.testing.assert_allclose(np.asarray(out["data"]), np.asarray(out2["data"]))


def test_noise_conditioning_zero_init_then_active(tiny_graph, rng):
    """ConditionalLayerNorm is zero-initialised (reference behaviour): members
    are identical at init; once the conditioning scale is non-zero, the
    per-member noise differentiates them."""
    import flax

    iface = ens_interface(tiny_graph, "NoiseConditioning")
    params = iface.init_params(jax.random.PRNGKey(0))
    n_grid = tiny_graph["data"].num_nodes
    m = 3
    x1 = rng.normal(size=(1, 2, 1, n_grid, 5)).astype(np.float32)
    x = {"data": jnp.broadcast_to(jnp.asarray(x1), (1, 2, m, n_grid, 5))}
    out = iface.apply(params, x, rng=jax.random.PRNGKey(7))
    members = np.asarray(out["data"])[0, 0]
    np.testing.assert_allclose(members[0], members[1], atol=1e-6)

    # nudge every conditional-norm scale kernel away from zero
    flat = flax.traverse_util.flatten_dict(params["params"])
    bumped = {
        k: (v + 0.1 if ("scale" in k and "kernel" in k) else v) for k, v in flat.items()
    }
    params2 = {"params": flax.traverse_util.unflatten_dict(bumped)}
    out2 = iface.apply(params2, x, rng=jax.random.PRNGKey(7))
    members2 = np.asarray(out2["data"])[0, 0]
    assert not np.allclose(members2[0], members2[1])


def test_crps_training_step(tiny_graph, rng):
    from anemoi_tpu.training.losses import get_loss_function
    from anemoi_tpu.training.optimizers import build_optimizer
    from anemoi_tpu.training.step import TrainState, make_step_fns

    iface = ens_interface(tiny_graph)
    params = iface.init_params(jax.random.PRNGKey(0))
    import optax

    losses = {"data": get_loss_function({"name": "KernelCRPS", "scalers": []}, {})}
    tx = build_optimizer({}, schedule=optax.constant_schedule(1e-3))
    state = TrainState.create(params, tx)
    train_step, eval_step = make_step_fns(
        iface, losses, rollout=1, remat_rollout=False, ensemble_size=3
    )
    n_grid = tiny_graph["data"].num_nodes
    batch = {"data": jnp.asarray(rng.normal(size=(1, 3, 1, n_grid, 6)), dtype=jnp.float32)}
    state2, metrics = train_step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1
    # params actually updated
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(state2.params)
    assert any(not np.allclose(np.asarray(x), np.asarray(y)) for x, y in zip(a, b))
    m = eval_step(state2, batch)
    assert np.isfinite(float(m["val_loss"]))

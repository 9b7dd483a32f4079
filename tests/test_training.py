"""End-to-end training cycle test (mirrors the reference's
training/tests/integration/test_training_cycle.py, scaled to CPU): synthetic
dataset, tiny GNN EncProcDec, 2 rollout steps, asserts the loss decreases and
checkpoints round-trip."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def make_config(tmp_path, backend="segment", processor="GNNProcessor"):
    enc_dec = {
        "GNNProcessor": ("GNNForwardMapper", "GNNBackwardMapper"),
        "GraphTransformerProcessor": (
            "GraphTransformerForwardMapper",
            "GraphTransformerBackwardMapper",
        ),
    }[processor]
    extra = {}
    if processor == "GraphTransformerProcessor":
        extra = {"num_heads": 4, "mlp_hidden_ratio": 2.0}
    return {
        "output_dir": str(tmp_path / "run"),
        "graph": {
            "save_path": str(tmp_path / "graph.npz"),
            "recipe": {
                "nodes": {
                    "data": {
                        "node_builder": {"name": "ReducedGaussianGridNodes", "grid": "o8"},
                        "attributes": {
                            "area_weight": {
                                "name": "CosineLatWeightedAttribute", "norm": "unit-max"
                            }
                        },
                    },
                    "hidden": {"node_builder": {"name": "TriNodes", "resolution": 1}},
                },
                "edges": [
                    {
                        "source_name": "data", "target_name": "hidden",
                        "edge_builder": {"name": "CutOffEdges", "cutoff_factor": 0.9},
                        "attributes": {
                            "edge_length": {"name": "EdgeLength"},
                            "edge_dirs": {"name": "EdgeDirection"},
                        },
                    },
                    {
                        "source_name": "hidden", "target_name": "hidden",
                        "edge_builder": {"name": "MultiScaleEdges", "x_hops": 1},
                        "attributes": {
                            "edge_length": {"name": "EdgeLength"},
                            "edge_dirs": {"name": "EdgeDirection"},
                        },
                    },
                    {
                        "source_name": "hidden", "target_name": "data",
                        "edge_builder": {"name": "KNNEdges", "num_nearest_neighbours": 3},
                        "attributes": {
                            "edge_length": {"name": "EdgeLength"},
                            "edge_dirs": {"name": "EdgeDirection"},
                        },
                    },
                ],
            },
        },
        "data": {
            "datasets": {
                "data": {
                    "kind": "synthetic",
                    "nodes": {"name": "ReducedGaussianGridNodes", "grid": "o8"},
                    "variables": ["q", "t", "u", "z", "tp", "cos_lat"],
                    "num_times": 40,
                    "speed_range": [0.5, 1.2],
                }
            },
            "forcing": ["cos_lat", "z"],
            "diagnostic": ["tp"],
            "processors": [{"name": "InputNormalizer", "default": "mean-std"}],
        },
        "model": {
            "name": "AnemoiModelEncProcDec",
            "num_channels": 16,
            "n_step_input": 2,
            "n_step_output": 1,
            "graph_attention_backend": backend,
            "trainable_parameters": {"data": 2, "hidden": 2},
            "encoder": {"name": enc_dec[0], **extra,
                        "sub_graph_edge_attributes": ["edge_dirs", "edge_length"]},
            "processor": {"name": processor, "num_layers": 2, **extra,
                          "sub_graph_edge_attributes": ["edge_dirs", "edge_length"]},
            "decoder": {"name": enc_dec[1], **extra,
                        "initialise_data_extractor_zero": True,
                        "sub_graph_edge_attributes": ["edge_dirs", "edge_length"]},
        },
        "training": {
            # 4 epochs: the r5 GNN mapper-depth parity fix (reference MLPs run
            # mlp_extra_layers+1 hidden layers) slows the tiny run's first
            # steps just enough that 3 epochs only bought a ~7% loss drop
            "max_epochs": 4,
            "lr": {"rate": 2e-3, "warmup": 5, "iterations": 100},
            "rollout": {"start": 2},
            "loss": {"name": "WeightedMSELoss", "scalers": ["area"]},
            "scalers": {
                "area": {"name": "GraphNodeAttributeScaler", "nodes_name": "data",
                         "attribute_name": "area_weight"}
            },
            "gradient_clip": {"val": 32.0, "algorithm": "value"},
        },
        "dataloader": {"batch_size": 2, "validation_fraction": 0.2},
        "diagnostics": {"log_interval": 1, "checkpoint_interval": 1000},
    }


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    from anemoi_tpu.training.trainer import AnemoiTrainer

    tmp_path = tmp_path_factory.mktemp("train")
    cfg = make_config(tmp_path)
    trainer = AnemoiTrainer(cfg, output_dir=cfg["output_dir"])
    result = trainer.train()
    return trainer, result, tmp_path


def test_loss_decreases(trained):
    trainer, result, tmp_path = trained
    records = [
        json.loads(line)
        for line in open(os.path.join(trainer.output_dir, "metrics.jsonl"))
    ]
    losses = [r["loss"] for r in records if "loss" in r]
    assert len(losses) >= 10
    assert losses[-1] < losses[0] * 0.9, f"loss did not decrease: {losses[0]} -> {losses[-1]}"
    assert all(np.isfinite(l) for l in losses)


def test_validation_ran(trained):
    trainer, result, _ = trained
    records = [
        json.loads(line)
        for line in open(os.path.join(trainer.output_dir, "metrics.jsonl"))
    ]
    vals = [r["val_loss"] for r in records if "val_loss" in r]
    assert vals and all(np.isfinite(v) for v in vals)


def test_validation_group_metrics(trained):
    """Default validation logs per-variable-group RMSE in post-processed
    space, keyed <metric>/<dataset>/<group>/<step> (ref
    train/methods/base.py:1002-1100) -- every validation, not only via the
    opt-in RolloutEval callback."""
    trainer, result, _ = trained
    records = [
        json.loads(line)
        for line in open(os.path.join(trainer.output_dir, "metrics.jsonl"))
    ]
    val_recs = [r for r in records if "val_loss" in r]
    assert val_recs
    group_keys = [k for k in val_recs[-1] if k.startswith("rmse/data/")]
    assert any(k == "rmse/data/sfc/1" for k in group_keys), group_keys
    # rollout start is 2 -> per-step keys for both steps
    assert any(k.endswith("/2") for k in group_keys), group_keys
    assert all(np.isfinite(val_recs[-1][k]) for k in group_keys)


def test_checkpoint_resume(trained):
    from anemoi_tpu.training.checkpoint import CheckpointManager
    from anemoi_tpu.training.step import TrainState

    trainer, result, _ = trained
    mgr = CheckpointManager(os.path.join(trainer.output_dir, "checkpoints"))
    assert mgr.latest_step() is not None
    fresh = TrainState.create(trainer.interface.init_params(), trainer.tx)
    restored = mgr.restore(fresh)
    assert restored is not None
    assert int(restored.step) == int(trainer.state.step)
    a = jax.tree_util.tree_leaves(restored.params)
    b = jax.tree_util.tree_leaves(trainer.state.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_inference_checkpoint_roundtrip(trained):
    from anemoi_tpu.training.checkpoint import load_inference_checkpoint

    trainer, result, _ = trained
    iface, params = load_inference_checkpoint(os.path.join(trainer.output_dir, "inference"))
    batch = next(iter(trainer.datamodule.val_batches()))
    out1 = iface.predict_step(params, jax.device_put(batch))
    out2 = trainer.interface.predict_step(trainer.state.params, jax.device_put(batch))
    np.testing.assert_allclose(
        np.asarray(out1["data"]), np.asarray(out2["data"]), atol=1e-5
    )


def test_prediction_beats_persistence(trained):
    """The trained model should forecast better than persistence (copying the
    last input step) on the synthetic data -- evidence learning happened."""
    trainer, _, _ = trained
    batch = next(iter(trainer.datamodule.val_batches()))
    m = trainer.interface.model.n_step_input
    pred = trainer.interface.predict_step(trainer.state.params, jax.device_put(batch))
    truth = batch["data"][:, m, ..., :]  # data-space step after inputs
    idx = trainer.data_indices["data"]
    model_out_in_data = [idx.name_to_index[n] for n in idx.model.output.ordered_names]
    truth_out = np.take(truth, model_out_in_data, axis=-1)
    persistence = np.take(batch["data"][:, m - 1], model_out_in_data, axis=-1)
    err_model = np.mean((np.asarray(pred["data"])[:, 0] - truth_out) ** 2)
    err_persist = np.mean((persistence - truth_out) ** 2)
    assert err_model < err_persist, (err_model, err_persist)


def test_temporal_downscaler_task(tiny_graph, rng):
    """Temporal downscaler: inputs are window endpoints, targets the interior
    steps (ref tasks/temporal_downscaler.py)."""
    import optax

    from anemoi_tpu.training.losses import get_loss_function
    from anemoi_tpu.training.optimizers import build_optimizer
    from anemoi_tpu.training.step import TrainState, make_step_fns
    from tests.test_models import build_interface, make_indices, make_statistics
    from anemoi_tpu.models.interface import AnemoiModelInterface
    from tests.test_models import model_config

    cfg = model_config()
    cfg["n_step_output"] = 2  # two interior frames between the endpoints
    iface = AnemoiModelInterface(
        config={"model": cfg, "data": {"processors": []}},
        graph=tiny_graph,
        data_indices={"data": make_indices()},
        statistics={"data": make_statistics()},
    )
    params = iface.init_params(jax.random.PRNGKey(0))
    losses = {"data": get_loss_function({"name": "WeightedMSELoss", "scalers": []}, {})}
    tx = build_optimizer({}, schedule=optax.constant_schedule(1e-3))
    state = TrainState.create(params, tx)
    train_step, _ = make_step_fns(
        iface, losses, rollout=1, remat_rollout=False, task="temporal_downscaler"
    )
    n_grid = tiny_graph["data"].num_nodes
    # window: endpoints at 0 and 3, interior targets at 1,2 -> 4 steps
    batch = {"data": jnp.asarray(rng.normal(size=(1, 4, 1, n_grid, 6)), dtype=jnp.float32)}
    state2, metrics = train_step(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_donated_train_step(tiny_graph, rng):
    """training.donate_state=True: the state buffers are donated to the step
    (frees the ~2x fp32 params+opt live set -- what lets 1024ch train without
    per-layer remat on one chip); stepping must still thread state correctly
    and match the undonated trajectory."""
    import optax

    from anemoi_tpu.training.losses import get_loss_function
    from anemoi_tpu.training.optimizers import build_optimizer
    from anemoi_tpu.training.step import TrainState, make_step_fns
    from tests.test_models import make_indices, make_statistics, model_config
    from anemoi_tpu.models.interface import AnemoiModelInterface

    iface = AnemoiModelInterface(
        config={"model": model_config(), "data": {"processors": []}},
        graph=tiny_graph,
        data_indices={"data": make_indices()},
        statistics={"data": make_statistics()},
    )
    params = iface.init_params(jax.random.PRNGKey(0))
    losses = {"data": get_loss_function({"name": "WeightedMSELoss", "scalers": []}, {})}
    n_grid = tiny_graph["data"].num_nodes
    batch = {"data": jnp.asarray(rng.normal(size=(1, 3, 1, n_grid, 6)), dtype=jnp.float32)}

    results = []
    for donate in (False, True):
        tx = build_optimizer({}, schedule=optax.constant_schedule(1e-3))
        state = TrainState.create(params, tx)
        train_step, _ = make_step_fns(
            iface, losses, rollout=1, remat_rollout=False, donate_state=donate
        )
        ls = []
        for _ in range(3):
            state, metrics = train_step(state, batch)
            ls.append(float(metrics["loss"]))
        results.append(ls)
    np.testing.assert_allclose(results[0], results[1], rtol=1e-6)


def test_multi_dataset_model(rng):
    """Two datasets on different grids sharing one hidden mesh (the reference's
    multi-dataset/fused-graph capability, test_multidatasets.yaml)."""
    from anemoi_tpu.graphs.create import GraphCreator
    from anemoi_tpu.models.interface import AnemoiModelInterface
    from tests.test_models import make_statistics
    from anemoi_tpu.data_indices import IndexCollection

    recipe = {
        "nodes": {
            "era": {"node_builder": {"name": "ReducedGaussianGridNodes", "grid": "o8"}},
            "lam": {"node_builder": {"name": "RegularLatLonNodes", "resolution": 20.0}},
            "hidden": {"node_builder": {"name": "TriNodes", "resolution": 1}},
        },
        "edges": [],
    }
    for ds in ["era", "lam"]:
        recipe["edges"] += [
            {"source_name": ds, "target_name": "hidden",
             "edge_builder": {"name": "KNNEdges", "num_nearest_neighbours": 4},
             "attributes": {"edge_length": {"name": "EdgeLength"}}},
            {"source_name": "hidden", "target_name": ds,
             "edge_builder": {"name": "KNNEdges", "num_nearest_neighbours": 3},
             "attributes": {"edge_length": {"name": "EdgeLength"}}},
        ]
    recipe["edges"].append(
        {"source_name": "hidden", "target_name": "hidden",
         "edge_builder": {"name": "MultiScaleEdges", "x_hops": 1},
         "attributes": {"edge_length": {"name": "EdgeLength"}}}
    )
    graph = GraphCreator(recipe).create()

    names = {"q": 0, "t": 1, "cos_lat": 2}
    indices = {
        ds: IndexCollection(names, forcing=["cos_lat"]) for ds in ["era", "lam"]
    }
    cfg = {
        "num_channels": 16, "n_step_input": 2, "n_step_output": 1,
        "encoder": {"name": "GNNForwardMapper",
                    "sub_graph_edge_attributes": ["edge_length"]},
        "processor": {"name": "GNNProcessor", "num_layers": 1,
                      "sub_graph_edge_attributes": ["edge_length"]},
        "decoder": {"name": "GNNBackwardMapper",
                    "sub_graph_edge_attributes": ["edge_length"]},
    }
    iface = AnemoiModelInterface(
        config={"model": cfg, "data": {"processors": []}},
        graph=graph,
        data_indices=indices,
        statistics={ds: make_statistics(3) for ds in ["era", "lam"]},
    )
    params = iface.init_params(jax.random.PRNGKey(0))
    x = {
        ds: jnp.asarray(
            rng.normal(size=(1, 2, 1, graph[ds].num_nodes, 3)), dtype=jnp.float32
        )
        for ds in ["era", "lam"]
    }
    out = iface.apply(params, x)
    assert out["era"].shape == (1, 1, 1, graph["era"].num_nodes, 2)
    assert out["lam"].shape == (1, 1, 1, graph["lam"].num_nodes, 2)
    assert np.isfinite(np.asarray(out["era"])).all()
    assert np.isfinite(np.asarray(out["lam"])).all()


def test_bf16_fp32_training_agreement(tiny_graph, rng):
    """Mixed-precision characterisation (bf16 compute copies of fp32
    masters): short training trajectories track the fp32 run -- losses
    within bf16 tolerance at every step, finite grads, same descent."""
    from tests.test_models import make_indices, make_statistics
    from anemoi_tpu.models.interface import AnemoiModelInterface
    from anemoi_tpu.training.losses import get_loss_function
    from anemoi_tpu.training.optimizers import build_optimizer
    from anemoi_tpu.training.step import TrainState, make_step_fns

    cfg = {
        "model": {
            "name": "AnemoiModelEncProcDec",
            "num_channels": 16,
            "n_step_input": 2,
            "n_step_output": 1,
            "encoder": {"name": "GraphTransformerForwardMapper", "num_heads": 4,
                        "mlp_hidden_ratio": 2.0},
            "processor": {"name": "GraphTransformerProcessor", "num_layers": 2,
                          "num_heads": 4, "mlp_hidden_ratio": 2.0,
                          "gradient_checkpointing": False},
            "decoder": {"name": "GraphTransformerBackwardMapper", "num_heads": 4,
                        "mlp_hidden_ratio": 2.0},
        },
        "data": {"processors": [{"name": "InputNormalizer", "default": "mean-std"}]},
    }
    iface = AnemoiModelInterface(
        config=cfg, graph=tiny_graph,
        data_indices={"data": make_indices()},
        statistics={"data": make_statistics()},
    )
    params = iface.init_params(jax.random.PRNGKey(0))
    losses = {"data": get_loss_function({"name": "WeightedMSELoss", "scalers": []}, {})}
    n_grid = tiny_graph["data"].num_nodes
    batch = {"data": jnp.asarray(rng.normal(size=(2, 3, 1, n_grid, 6)), jnp.float32)}

    def run(precision, **kw):
        tx = build_optimizer({"lr": {"rate": 2e-3, "warmup": 1, "iterations": 100}})
        state = TrainState.create(params, tx)
        step, _ = make_step_fns(
            iface, losses, rollout=1, remat_rollout=False, precision=precision,
            **kw,
        )
        out = []
        for _ in range(6):
            state, m = step(state, batch)
            out.append((float(m["loss"]), float(m["grad_norm"])))
        return out

    fp32 = run("fp32")
    bf16 = run("bf16")
    for (l32, g32), (l16, g16) in zip(fp32, bf16):
        assert np.isfinite(l16) and np.isfinite(g16)
        # bf16 has ~3 decimal digits; trajectories must track within ~2%
        assert abs(l16 - l32) / max(abs(l32), 1e-6) < 2e-2, (l16, l32)
        assert abs(g16 - g32) / max(abs(g32), 1e-6) < 0.15, (g16, g32)
    # both descend
    assert fp32[-1][0] < fp32[0][0]
    assert bf16[-1][0] < bf16[0][0]

    # fp32_head: decoder head (extractor/norm) stays fp32 under bf16 compute
    # -- the trajectory must track fp32 at least as closely as plain bf16 and
    # differ from it (the switch actually changes the computation)
    head = run("bf16", fp32_head=True)
    for (l32, _), (lh, gh) in zip(fp32, head):
        assert np.isfinite(lh) and np.isfinite(gh)
        assert abs(lh - l32) / max(abs(l32), 1e-6) < 2e-2
    assert any(abs(lh - l16) > 0 for (lh, _), (l16, _) in zip(head, bf16))
    assert head[-1][0] < head[0][0]


def test_trainer_transport_task(tmp_path):
    """training.task='transport' routes the trainer to the transport step
    (EDM + interpolant-with-sources paths both train through the full loop)."""
    from anemoi_tpu.training.trainer import AnemoiTrainer

    for tcfg in (
        {"objective": "edm", "sigma_dist": {"kind": "karras"}},
        {"objective": "interpolant", "source": "gaussian",
         "interpolant_gamma": 0.3},
    ):
        cfg = make_config(tmp_path)
        cfg["model"]["name"] = "AnemoiTransportModelEncProcDec"
        cfg["model"]["noise_embed_dim"] = 8
        cfg["model"]["processor"]["conditional"] = True
        cfg["model"].pop("trainable_parameters", None)
        cfg["training"]["task"] = "transport"
        cfg["training"]["transport"] = tcfg
        cfg["training"]["max_epochs"] = 1
        cfg["training"]["rollout"] = {"start": 1}
        out = str(tmp_path / f"out_{tcfg['objective']}")
        trainer = AnemoiTrainer(cfg, output_dir=out)
        res = trainer.train()
        assert np.isfinite(res["final_loss"]), res


def test_rollout_precompile_overlap(tmp_path):
    """The rollout curriculum's next XLA program is AOT-compiled on a
    background thread and used when the curriculum advances (weak point:
    per-rollout jit recompiles stall training on the slow TPU compiler)."""
    from anemoi_tpu.training.trainer import AnemoiTrainer

    cfg = make_config(tmp_path)
    cfg["training"]["max_epochs"] = 2
    cfg["training"]["rollout"] = {"start": 1, "epoch_increment": 1, "max": 2}
    trainer = AnemoiTrainer(cfg, output_dir=cfg["output_dir"])
    result = trainer.train()
    assert np.isfinite(result["final_loss"])
    # rollout 2 was compiled ahead of time: the cached train step wraps an
    # AOT Compiled object, not a fresh jit wrapper
    assert 2 in trainer._step_fns
    train_step_2 = trainer._step_fns[2][0]
    assert train_step_2.__name__ == "compiled_step", train_step_2


def test_rollout_remat_policy_grads_match(tiny_graph, rng):
    """Rollout-2 train step: the rollout checkpoint with remat_policy
    "save_attention" produces grads identical to unchecked and fully-rematted
    variants (step.py wraps `forward` in jax.checkpoint with the policy)."""
    import optax

    from anemoi_tpu.models.interface import AnemoiModelInterface
    from anemoi_tpu.training.losses import get_loss_function
    from anemoi_tpu.training.optimizers import build_optimizer
    from anemoi_tpu.training.step import TrainState, make_step_fns
    from tests.test_models import make_indices, make_statistics, model_config

    cfg = model_config(processor="GraphTransformerProcessor")
    iface = AnemoiModelInterface(
        config={"model": cfg, "data": {"processors": []}},
        graph=tiny_graph,
        data_indices={"data": make_indices()},
        statistics={"data": make_statistics()},
    )
    params = iface.init_params(jax.random.PRNGKey(0))
    losses = {"data": get_loss_function({"name": "WeightedMSELoss", "scalers": []}, {})}
    tx = build_optimizer({}, schedule=optax.constant_schedule(1e-3))
    n_grid = tiny_graph["data"].num_nodes
    batch = {"data": jnp.asarray(rng.normal(size=(1, 4, 1, n_grid, 6)), dtype=jnp.float32)}

    def run(remat, policy):
        step, _ = make_step_fns(
            iface, losses, rollout=2, remat_rollout=remat, remat_policy=policy
        )
        state = TrainState.create(params, tx)
        state2, metrics = step(state, batch)
        return metrics["loss"], state2.params

    loss_ref, p_ref = run(False, None)
    for policy in (None, "save_attention"):
        loss_pol, p_pol = run(True, policy)
        np.testing.assert_allclose(float(loss_pol), float(loss_ref), rtol=1e-6)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5
            ),
            p_ref, p_pol,
        )

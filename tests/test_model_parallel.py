"""Full-train-step model-parallel parity on the 8-virtual-device CPU mesh.

The flagship-shaped (scaled-down) GraphTransformer EncProcDec trains with the
"edges" (halo-exchange shard_map, ref models/layers/block.py:1148-1183) and
"heads" (Ulysses all_to_all, ref layers/attention.py:208-237) strategies wired
through the REAL model and step functions; losses must match the
single-device run (ref distributed/strategy.py:88-271 is the torch
equivalent of the mesh+sharding layout exercised here).
"""

from contextlib import nullcontext

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from anemoi_tpu.data_indices.collection import IndexCollection
from anemoi_tpu.graphs.create import GraphCreator
from anemoi_tpu.models.interface import AnemoiModelInterface
from anemoi_tpu.parallel.mesh import MeshSpec, batch_sharding, create_mesh
from anemoi_tpu.training.losses import get_loss_function
from anemoi_tpu.training.optimizers import build_lr_schedule, build_optimizer
from anemoi_tpu.training.step import TrainState, make_step_fns

VARIABLES = ["q", "t", "u", "z", "cos_lat"]


def _recipe():
    return {
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
                "attributes": {"edge_length": {"name": "EdgeLength"},
                               "edge_dirs": {"name": "EdgeDirection"}},
            },
            {
                "source_name": "hidden", "target_name": "hidden",
                "edge_builder": {"name": "MultiScaleEdges", "x_hops": 1},
                "attributes": {"edge_length": {"name": "EdgeLength"},
                               "edge_dirs": {"name": "EdgeDirection"}},
            },
            {
                "source_name": "hidden", "target_name": "data",
                "edge_builder": {"name": "KNNEdges", "num_nearest_neighbours": 3},
                "attributes": {"edge_length": {"name": "EdgeLength"},
                               "edge_dirs": {"name": "EdgeDirection"}},
            },
        ],
    }


_GRAPH = None


def _graph():
    global _GRAPH
    if _GRAPH is None:
        _GRAPH = GraphCreator(_recipe()).create()
    return _GRAPH


def _build_interface(shard_strategy="none", n_shards=1, processor="gt",
                     backend="padded", paged_block=None, halo_overlap=True):
    graph = _graph()
    indices = {
        "data": IndexCollection(
            {n: i for i, n in enumerate(VARIABLES)}, forcing=["cos_lat"]
        )
    }
    nv = len(VARIABLES)
    stats = {
        "data": {
            "mean": np.zeros(nv, np.float32),
            "stdev": np.ones(nv, np.float32),
            "minimum": -np.ones(nv, np.float32),
            "maximum": np.ones(nv, np.float32),
        }
    }
    gt = {"num_heads": 4, "mlp_hidden_ratio": 2.0,
          "sub_graph_edge_attributes": ["edge_dirs", "edge_length"]}
    if processor == "gt":
        proc = {"name": "GraphTransformerProcessor", "num_layers": 2,
                "gradient_checkpointing": False, **gt}
    else:
        proc = {"name": "TransformerProcessor", "num_layers": 2, "num_heads": 4,
                "window_size": 8, "gradient_checkpointing": False}
    config = {
        "model": {
            "name": "AnemoiModelEncProcDec",
            "num_channels": 16,
            "n_step_input": 2,
            "n_step_output": 1,
            "graph_attention_backend": backend,
            **({"paged_block": list(paged_block)} if paged_block else {}),
            "halo_overlap": halo_overlap,
            "shard_strategy": shard_strategy,
            "num_model_shards": n_shards,
            "encoder": {"name": "GraphTransformerForwardMapper", **gt},
            "processor": proc,
            "decoder": {"name": "GraphTransformerBackwardMapper", **gt},
        },
        "data": {"processors": [{"name": "InputNormalizer", "default": "mean-std"}]},
    }
    return AnemoiModelInterface(
        config=config, graph=graph, data_indices=indices, statistics=stats
    )


def _run(iface, params, batch_np, mesh=None, steps=2, loss="WeightedMSELoss",
         ensemble_size=1):
    losses = {"data": get_loss_function({"name": loss, "scalers": []}, {})}
    tx = build_optimizer({"lr": {"rate": 1e-3, "warmup": 1, "iterations": 100}})
    ctx = jax.set_mesh(mesh) if mesh is not None else nullcontext()
    out = []
    with ctx:
        state = TrainState.create(params, tx)
        if mesh is not None:
            state = jax.device_put(state, NamedSharding(mesh, P()))
        train_step, _ = make_step_fns(
            iface, losses, rollout=1, remat_rollout=False,
            ensemble_size=ensemble_size,
        )
        for i in range(steps):
            if mesh is not None:
                batch = {
                    ds: jax.device_put(v, batch_sharding(mesh, shard_grid=True))
                    for ds, v in batch_np.items()
                }
            else:
                batch = {ds: jnp.asarray(v) for ds, v in batch_np.items()}
            state, metrics = train_step(state, batch)
            out.append(float(metrics["loss"]))
    return out


def _mesh(model=4):
    spec = MeshSpec(data=8 // model, model=model, ensemble=1)
    return create_mesh(spec)


@pytest.fixture(scope="module")
def reference_run():
    iface = _build_interface()
    params = iface.init_params()
    rng = np.random.default_rng(7)
    n_grid = iface.model_graph.num_nodes["data"]
    batch = {"data": rng.normal(size=(2, 3, 1, n_grid, len(VARIABLES))).astype(np.float32)}
    return iface, params, batch, _run(iface, params, batch)


@pytest.mark.parametrize("strategy", ["edges", "heads", "gspmd"])
def test_gt_shard_strategy_parity(reference_run, strategy):
    _, params, batch, ref_losses = reference_run
    iface = _build_interface(shard_strategy=strategy, n_shards=4)
    if strategy == "edges":
        # the mappers must take the bipartite halo path, not the GSPMD
        # padded fallback (ref block.py:870-1032 mapper shard path)
        for group in ("encoder", "decoder"):
            ed = iface.graph_inputs[group]["data"]
            assert ed.halo_tables is not None, f"{group} mapper not halo-sharded"
    got = _run(iface, params, batch, mesh=_mesh(4))
    np.testing.assert_allclose(got, ref_losses, rtol=5e-5, atol=1e-6)


def test_gt_edges_paged_kernel_parity(reference_run):
    """The paged Pallas kernel INSIDE the halo shard_map trains the full step
    with losses matching the single-device padded run (interpret mode)."""
    from anemoi_tpu.ops.pallas import paged_gt

    _, params, batch, ref_losses = reference_run
    iface = _build_interface(
        shard_strategy="edges", n_shards=4, backend="paged",
        paged_block=(16, 32, 16),
    )
    assert iface.graph_inputs["processor"].halo_paged_meta == (16, 32, 16)
    # the bipartite mappers run the paged kernel inside their own halo
    # shard_map too (pg_* tables present on the stacked shard tables)
    for group in ("encoder", "decoder"):
        ed = iface.graph_inputs[group]["data"]
        assert ed.halo_paged_meta is not None, f"{group} mapper not paged"
        assert (
            "pg_blk_ids" in ed.halo_tables
            or "int_pg_blk_ids" in ed.halo_tables  # halo-overlap split tables
        )
    paged_gt.set_interpret(True)
    try:
        got = _run(iface, params, batch, mesh=_mesh(4))
    finally:
        paged_gt.set_interpret(False)
    np.testing.assert_allclose(got, ref_losses, rtol=5e-5, atol=1e-6)


def test_gspmd_paged_upgrades_to_halo_kernel(reference_run):
    """shard_strategy: gspmd with the paged backend must NOT silently
    downgrade to padded tables (GSPMD can't partition a pallas_call): the
    model upgrades the route to the per-shard halo path, keeps the paged
    kernel, and still matches the unsharded losses.  Opt-out honoured."""
    from anemoi_tpu.ops.pallas import paged_gt

    _, params, batch, ref_losses = reference_run
    iface = _build_interface(
        shard_strategy="gspmd", n_shards=4, backend="paged",
        paged_block=(16, 32, 16),
    )
    assert iface.model.shard_strategy == "edges"  # upgraded route
    assert iface.graph_inputs["processor"].halo_paged_meta == (16, 32, 16)
    paged_gt.set_interpret(True)
    try:
        got = _run(iface, params, batch, mesh=_mesh(4))
    finally:
        paged_gt.set_interpret(False)
    np.testing.assert_allclose(got, ref_losses, rtol=5e-5, atol=1e-6)

    # explicit opt-out: pure GSPMD keeps constraint-only sharding (the
    # paged kernel then correctly falls back to padded tables)
    iface_off = _build_interface(
        shard_strategy="gspmd", n_shards=4, backend="paged",
    )
    iface_off.model.config["gspmd_paged_upgrade"] = False
    assert iface_off.model.shard_strategy == "gspmd"


def _build_ens_interface(shard_strategy="none", n_shards=1):
    graph = _graph()
    indices = {
        "data": IndexCollection(
            {n: i for i, n in enumerate(VARIABLES)}, forcing=["cos_lat"]
        )
    }
    nv = len(VARIABLES)
    stats = {
        "data": {
            "mean": np.zeros(nv, np.float32),
            "stdev": np.ones(nv, np.float32),
            "minimum": -np.ones(nv, np.float32),
            "maximum": np.ones(nv, np.float32),
        }
    }
    gt = {"num_heads": 4, "mlp_hidden_ratio": 2.0,
          "sub_graph_edge_attributes": ["edge_dirs", "edge_length"]}
    config = {
        "model": {
            "name": "AnemoiEnsModelEncProcDec",
            "num_channels": 16,
            "n_step_input": 2,
            "n_step_output": 1,
            "graph_attention_backend": "padded",
            "shard_strategy": shard_strategy,
            "num_model_shards": n_shards,
            "noise_injector": {"name": "NoiseInjector", "noise_std": 1.0,
                               "noise_channels_dim": 4,
                               "noise_mlp_hidden_dim": 8},
            "encoder": {"name": "GraphTransformerForwardMapper", **gt},
            "processor": {"name": "GraphTransformerProcessor", "num_layers": 2,
                          "gradient_checkpointing": False, **gt},
            "decoder": {"name": "GraphTransformerBackwardMapper", **gt},
        },
        "data": {"processors": [{"name": "InputNormalizer", "default": "mean-std"}]},
    }
    return AnemoiModelInterface(
        config=config, graph=graph, data_indices=indices, statistics=stats
    )


def test_ensemble_parallel_crps_parity():
    """4 CRPS members over a 4-way 'ensemble' mesh axis x 2 model shards ==
    single-device 4-member CRPS (ref train/methods/ensemble.py:166-171
    gather_ensemble_members; here the member all-gather is inserted by GSPMD
    at the pairwise spread term, and partitionable threefry makes the
    per-member noise device-count-invariant)."""
    iface0 = _build_ens_interface()
    params = iface0.init_params()
    rng = np.random.default_rng(11)
    n_grid = iface0.model_graph.num_nodes["data"]
    batch = {"data": rng.normal(size=(1, 3, 1, n_grid, len(VARIABLES))).astype(np.float32)}
    ref = _run(iface0, params, batch, loss="KernelCRPS", ensemble_size=4)

    iface = _build_ens_interface(shard_strategy="edges", n_shards=2)
    mesh = create_mesh(MeshSpec(data=1, model=2, ensemble=4))
    got = _run(iface, params, batch, mesh=mesh, loss="KernelCRPS", ensemble_size=4)
    np.testing.assert_allclose(got, ref, rtol=5e-5, atol=1e-6)


def test_transformer_heads_parity():
    iface0 = _build_interface(processor="transformer")
    params = iface0.init_params()
    rng = np.random.default_rng(3)
    n_grid = iface0.model_graph.num_nodes["data"]
    batch = {"data": rng.normal(size=(2, 3, 1, n_grid, len(VARIABLES))).astype(np.float32)}
    ref = _run(iface0, params, batch)
    iface = _build_interface(shard_strategy="heads", n_shards=4, processor="transformer")
    got = _run(iface, params, batch, mesh=_mesh(4))
    np.testing.assert_allclose(got, ref, rtol=5e-5, atol=1e-6)


def test_zero_optimizer_state_sharding(tmp_path):
    """training.optimizer.zero shards optimizer moments over the data axis
    (ZeRO-1 equivalent of the reference's zero.yaml): per-device footprint
    drops, the step still trains, and the state stays sharded after it."""
    import jax
    import numpy as np

    from anemoi_tpu.training.trainer import AnemoiTrainer
    from tests.test_training import make_config

    cfg = make_config(tmp_path)
    cfg["hardware"] = {"num_devices": 4, "num_devices_per_model": 1}
    cfg["training"]["optimizer"] = {"name": "adamw", "zero": True}
    cfg["training"]["max_epochs"] = 1
    cfg["training"]["max_steps"] = 2
    trainer = AnemoiTrainer(cfg, output_dir=cfg["output_dir"])

    def sharded_leaves(tree):
        return [
            x for x in jax.tree_util.tree_leaves(tree)
            if hasattr(x, "sharding") and x.ndim >= 1 and x.shape[0] % 4 == 0
            and not x.sharding.is_fully_replicated
        ]

    before = sharded_leaves(trainer.state.opt_state)
    assert before, "no optimizer-state leaf was sharded"
    # sharded leaf holds 1/4 per device
    leaf = before[0]
    shard_rows = leaf.addressable_shards[0].data.shape[0]
    assert shard_rows == leaf.shape[0] // 4

    result = trainer.train()
    assert np.isfinite(result["final_loss"])
    assert sharded_leaves(trainer.state.opt_state), "sharding lost after step"


def test_gt_edges_no_overlap_parity(reference_run):
    """model.halo_overlap=false keeps the plain (non-split) halo path alive:
    full-train-step losses match the single-device reference, and no split
    tables are built."""
    _, params, batch, ref_losses = reference_run
    iface = _build_interface(shard_strategy="edges", n_shards=4,
                             halo_overlap=False)
    ed = iface.graph_inputs["processor"]
    assert "ib_split_idx" not in ed.halo_tables
    got = _run(iface, params, batch, mesh=_mesh(4))
    np.testing.assert_allclose(got, ref_losses, rtol=5e-5, atol=1e-6)


@pytest.mark.parametrize("strategy", ["edges", "heads"])
def test_transport_shard_parity(strategy):
    """The generative (EDM transport) training step under model parallelism
    matches unsharded execution: partitionable threefry noise is
    sharding-invariant, and the per-node noise conditioning follows the
    processor's node padding (the bug this test gates). The transport model
    inherits the EncProcDec mapper/processor shard machinery."""
    import optax

    from anemoi_tpu.models.interface import AnemoiModelInterface
    from anemoi_tpu.training.losses import get_loss_function
    from anemoi_tpu.training.optimizers import build_optimizer
    from anemoi_tpu.training.step import TrainState
    from anemoi_tpu.training.transport_step import make_transport_step_fns

    def build(shard_strategy="none", n_shards=1):
        cfg = {
            "name": "AnemoiTransportModelEncProcDec",
            "num_channels": 16,
            "n_step_input": 2,
            "n_step_output": 1,
            "noise_embed_dim": 8,
            "shard_strategy": shard_strategy,
            "num_model_shards": n_shards,
            "encoder": {"name": "GraphTransformerForwardMapper", "num_heads": 4,
                        "mlp_hidden_ratio": 2.0},
            "processor": {"name": "GraphTransformerProcessor", "num_layers": 2,
                          "num_heads": 4, "mlp_hidden_ratio": 2.0,
                          "conditional": True, "gradient_checkpointing": False},
            "decoder": {"name": "GraphTransformerBackwardMapper", "num_heads": 4,
                        "mlp_hidden_ratio": 2.0},
        }
        return AnemoiModelInterface(
            config={"model": cfg, "data": {"processors": [
                {"name": "InputNormalizer", "default": "mean-std"}]}},
            graph=_graph(),
            data_indices={"data": IndexCollection(
                {n: i for i, n in enumerate(VARIABLES)}, forcing=["cos_lat"])},
            statistics={"data": {
                "mean": np.zeros(len(VARIABLES), np.float32),
                "stdev": np.ones(len(VARIABLES), np.float32),
                "minimum": -np.ones(len(VARIABLES), np.float32),
                "maximum": np.ones(len(VARIABLES), np.float32),
            }},
        )

    def run(iface, params, batch_np, mesh=None):
        losses = {"data": get_loss_function({"name": "WeightedMSELoss", "scalers": []}, {})}
        tx = build_optimizer({}, schedule=optax.constant_schedule(1e-3))
        rng = jax.random.PRNGKey(11)
        ctx = jax.set_mesh(mesh) if mesh is not None else nullcontext()
        out = []
        with ctx:
            state = TrainState.create(params, tx)
            if mesh is not None:
                state = jax.device_put(state, NamedSharding(mesh, P()))
            train_step, _ = make_transport_step_fns(
                iface, losses, objective="edm", base_rng=rng
            )
            for _ in range(2):
                if mesh is not None:
                    batch = {ds: jax.device_put(v, batch_sharding(mesh, shard_grid=True))
                             for ds, v in batch_np.items()}
                else:
                    batch = {ds: jnp.asarray(v) for ds, v in batch_np.items()}
                state, metrics = train_step(state, batch)
                out.append(float(metrics["loss"]))
        return out

    ref_iface = build()
    params = ref_iface.init_params()
    rng = np.random.default_rng(5)
    n_grid = ref_iface.model_graph.num_nodes["data"]
    batch = {"data": rng.normal(size=(2, 3, 1, n_grid, len(VARIABLES))).astype(np.float32)}

    ref = run(ref_iface, params, batch)
    sharded = build(shard_strategy=strategy, n_shards=4)
    got = run(sharded, params, batch, mesh=_mesh(4))
    assert all(np.isfinite(ref)) and all(np.isfinite(got))
    np.testing.assert_allclose(got, ref, rtol=5e-5, atol=1e-6)


@pytest.mark.parametrize("strategy", ["gspmd", "edges", "edges-paged"])
def test_hierarchical_mesh_parity(strategy):
    """The hierarchical V-cycle trains on the device mesh matching unsharded
    losses: via GSPMD propagation from the grid-sharded batch, and via the
    edges strategy (every hierarchy sub-graph gets its own halo tables —
    level processors square-partitioned, enc/dec/down/up mappers bipartite,
    round 3)."""
    from anemoi_tpu.graphs.create import GraphCreator
    from anemoi_tpu.models.interface import AnemoiModelInterface
    from tests.test_models import make_indices, make_statistics

    attrs = {"attributes": {"edge_length": {"name": "EdgeLength"},
                            "edge_dirs": {"name": "EdgeDirection"}}}
    recipe = {
        "nodes": {
            "data": {"node_builder": {"name": "ReducedGaussianGridNodes", "grid": "o8"}},
            "hidden_1": {"node_builder": {"name": "TriNodes", "resolution": 2}},
            "hidden_2": {"node_builder": {"name": "TriNodes", "resolution": 1}},
        },
        "edges": [
            {"source_name": "data", "target_name": "hidden_1",
             "edge_builder": {"name": "CutOffEdges", "cutoff_factor": 0.9}, **attrs},
            {"source_name": "hidden_1", "target_name": "hidden_1",
             "edge_builder": {"name": "MultiScaleEdges", "x_hops": 1}, **attrs},
            {"source_name": "hidden_2", "target_name": "hidden_2",
             "edge_builder": {"name": "MultiScaleEdges", "x_hops": 1}, **attrs},
            {"source_name": "hidden_1", "target_name": "hidden_2",
             "edge_builder": {"name": "KNNEdges", "num_nearest_neighbours": 3}, **attrs},
            {"source_name": "hidden_2", "target_name": "hidden_1",
             "edge_builder": {"name": "KNNEdges", "num_nearest_neighbours": 3}, **attrs},
            {"source_name": "hidden_1", "target_name": "data",
             "edge_builder": {"name": "KNNEdges", "num_nearest_neighbours": 3}, **attrs},
        ],
    }
    graph = GraphCreator(recipe).create()
    cfg = {
        "name": "AnemoiModelEncProcDecHierarchical",
        "num_channels": 16,
        "n_step_input": 2,
        "n_step_output": 1,
        "hidden_names": ["hidden_1", "hidden_2"],
        "level_process": True,
        "shard_strategy": "none",
        "num_model_shards": 1,
        "encoder": {"name": "GraphTransformerForwardMapper", "num_heads": 4,
                    "mlp_hidden_ratio": 2.0,
                    "sub_graph_edge_attributes": ["edge_dirs", "edge_length"]},
        "processor": {"name": "GraphTransformerProcessor", "num_layers": 1,
                      "num_heads": 4, "mlp_hidden_ratio": 2.0,
                      "gradient_checkpointing": False,
                      "sub_graph_edge_attributes": ["edge_dirs", "edge_length"]},
        "decoder": {"name": "GraphTransformerBackwardMapper", "num_heads": 4,
                    "mlp_hidden_ratio": 2.0,
                    "sub_graph_edge_attributes": ["edge_dirs", "edge_length"]},
    }
    def make(cfg):
        return AnemoiModelInterface(
            config={"model": cfg, "data": {"processors": [
                {"name": "InputNormalizer", "default": "mean-std"}]}},
            graph=graph,
            data_indices={"data": make_indices()},
            statistics={"data": make_statistics()},
        )

    iface = make(cfg)
    params = iface.init_params()
    rng = np.random.default_rng(9)
    n_grid = graph["data"].num_nodes
    batch = {"data": rng.normal(size=(2, 3, 1, n_grid, 6)).astype(np.float32)}
    ref = _run(iface, params, batch)
    interpret = strategy == "edges-paged"
    if strategy.startswith("edges"):
        iface = make({**cfg, "shard_strategy": "edges", "num_model_shards": 4,
                      **({"graph_attention_backend": "paged",
                          "paged_block": [8, 16, 8],
                          "paged_mapper_block": [8, 16, 8]} if interpret else {})})
        for group in ("level", "down", "up"):
            for ed in iface.graph_inputs[group].values():
                assert ed.halo_tables is not None, f"{group} not halo-sharded"
                if interpret:
                    assert ed.halo_paged_meta is not None, f"{group} not paged"
    if interpret:
        from anemoi_tpu.ops.pallas import paged_gt

        paged_gt.set_interpret(True)
    try:
        got = _run(iface, params, batch, mesh=_mesh(4))
    finally:
        if interpret:
            paged_gt.set_interpret(False)
    np.testing.assert_allclose(got, ref, rtol=5e-5, atol=1e-6)


def test_predict_step_edges_shard_parity(reference_run):
    """Sharded serving: predict_step (pre -> bf16 forward -> post) under the
    edges strategy on the mesh matches single-device output — the multi-chip
    inference path of docs/serving.md. Inference tables are the same halo
    tables the training step used."""
    iface_ref, params, batch, _ = reference_run
    xb = {ds: jnp.asarray(v) for ds, v in batch.items()}
    ref = np.asarray(iface_ref.predict_step(params, xb)["data"])

    iface = _build_interface(shard_strategy="edges", n_shards=4)
    mesh = _mesh(4)
    with jax.set_mesh(mesh):
        xs = {ds: jax.device_put(v, batch_sharding(mesh, shard_grid=True))
              for ds, v in batch.items()}
        gi = iface.inference_graph_inputs
        got = np.asarray(
            jax.jit(iface.predict_step)(params, xs, gi)["data"]
        )
    # bf16 forward on both sides; identical math up to reduction order
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(got.mean(), ref.mean(), atol=1e-4)


def test_edges_bundle_serves_on_single_device(reference_run, tmp_path):
    """An inference bundle recorded under shard_strategy=edges must load and
    predict WITHOUT a mesh: the strategy is a training-time execution detail,
    so load_inference_checkpoint degrades it to the single-device path (the
    reference's Lightning strategy is likewise dropped when the pickled
    inference model is loaded standalone)."""
    from anemoi_tpu.training.checkpoint import (
        load_inference_checkpoint,
        save_inference_checkpoint,
    )

    iface_ref, params, batch, _ = reference_run
    ref = np.asarray(
        iface_ref.predict_step(params, {ds: jnp.asarray(v) for ds, v in batch.items()})["data"]
    )

    iface = _build_interface(shard_strategy="edges", n_shards=4)
    gpath = tmp_path / "g.npz"
    _graph().save(str(gpath))
    config = dict(iface.config)
    config["graph"] = {"save_path": str(gpath)}
    di_config = {
        ds: {
            "name_to_index": idx.name_to_index,
            "forcing": idx.forcing,
            "diagnostic": idx.diagnostic,
            "target": idx.target,
        }
        for ds, idx in iface.data_indices.items()
    }
    save_inference_checkpoint(
        str(tmp_path / "bundle"), params, config, di_config, iface.statistics
    )

    loaded_iface, loaded_params = load_inference_checkpoint(str(tmp_path / "bundle"))
    assert loaded_iface.model.shard_strategy == "none"
    got = np.asarray(
        loaded_iface.predict_step(
            loaded_params, {ds: jnp.asarray(v) for ds, v in batch.items()}
        )["data"]
    )
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)

"""Training orchestration.

Equivalent of /root/reference/training/src/anemoi/training/train/train.py:63-763
(AnemoiTrainer): config -> graph (load-or-create) -> datamodule -> model
interface -> losses/scalers -> optimizer -> jitted step loop with logging,
validation, checkpointing, rollout curriculum and graceful time-limit stop.

The Lightning machinery is replaced by an explicit loop over jitted steps;
device transfer is a `jax.device_put` per batch (async dispatch pipelines the
host->device copy with compute).
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from anemoi_tpu.data.datamodule import DataModule
from anemoi_tpu.data.dataset import open_dataset
from anemoi_tpu.data_indices.collection import IndexCollection
from anemoi_tpu.graphs.create import GraphCreator
from anemoi_tpu.graphs.graph import Graph
from anemoi_tpu.models.interface import AnemoiModelInterface
from anemoi_tpu.training.checkpoint import CheckpointManager, save_inference_checkpoint
from anemoi_tpu.training.losses import get_loss_function
from anemoi_tpu.training.losses.scalers import create_scalers
from anemoi_tpu.training.optimizers import build_lr_schedule, build_optimizer
from anemoi_tpu.training.step import TrainState, make_step_fns

LOGGER = logging.getLogger(__name__)


class RolloutSchedule:
    """Rollout curriculum (ref tasks/forecaster.py RolloutConfig): start value,
    increment every N epochs, up to a maximum."""

    def __init__(self, config: Optional[dict]) -> None:
        cfg = dict(config or {})
        self.start = int(cfg.get("start", 1))
        self.epoch_increment = int(cfg.get("epoch_increment", 0))
        self.maximum = int(cfg.get("max", self.start))

    def at_epoch(self, epoch: int) -> int:
        if self.epoch_increment <= 0:
            return self.start
        return min(self.start + (epoch // self.epoch_increment), self.maximum)


class AnemoiTrainer:
    def __init__(self, config: Dict[str, Any], output_dir: Optional[str] = None) -> None:
        self.config = config
        self.output_dir = output_dir or config.get("output_dir", "runs/default")
        os.makedirs(self.output_dir, exist_ok=True)

        # the reference wires Lightning's detect_anomaly from
        # diagnostics.debug.anomaly_detection (train/train.py:722); the jax
        # equivalent aborts with a traceback at the first NaN-producing op
        if bool(
            (config.get("diagnostics", {}).get("debug") or {}).get(
                "anomaly_detection", False
            )
        ):
            jax.config.update("jax_debug_nans", True)
            LOGGER.info("Anomaly detection on: jax_debug_nans enabled")

        # --- graph ----------------------------------------------------
        graph_cfg = dict(config.get("graph", {}))
        save_path = graph_cfg.get("save_path")
        recipe = graph_cfg.get("recipe", graph_cfg)
        if save_path and os.path.exists(save_path) and not graph_cfg.get("overwrite", False):
            self.graph = Graph.load(save_path)
        else:
            self.graph = GraphCreator(recipe).create(save_path)

        # --- data -----------------------------------------------------
        data_cfg = dict(config.get("data", {}))
        datasets = {
            name: open_dataset(ds_cfg)
            for name, ds_cfg in data_cfg.get("datasets", {}).items()
        }
        assert datasets, "config.data.datasets must define at least one dataset"

        model_cfg = config.get("model", {})
        training_cfg = dict(config.get("training", {}))
        # the `task` config group (ref config/task/*.yaml) selects the
        # time-offset algebra; training.task wins when both are set
        task_group = dict(config.get("task", {}) or {})
        if task_group.get("name") and "task" not in training_cfg:
            training_cfg["task"] = str(task_group["name"])
            config = dict(config)
            config["training"] = training_cfg
            self.config = config

        # --- device mesh (data/model/ensemble parallelism) -------------
        # ref distributed/strategy.py:88-271 DDPGroupStrategy: here one
        # jax.sharding.Mesh; the model-parallel strategy (edges halo / heads
        # Ulysses / gspmd) is selected by model.shard_strategy and the mesh
        # factorisation by hardware.num_devices_per_model etc.
        from anemoi_tpu.parallel.distributed import maybe_initialize
        from anemoi_tpu.parallel.mesh import MeshSpec, create_mesh

        # multi-host: jax.distributed.initialize from env (no-op single
        # process); must run before the first jax.devices() below so the
        # backend sees the global device set
        maybe_initialize()

        self.mesh = None
        self.mesh_spec = MeshSpec()
        hw = dict(config.get("hardware", {}))
        if hw:
            n_dev = int(hw.get("num_devices", len(jax.devices())))
            self.mesh_spec = MeshSpec.from_config(hw, num_devices=n_dev)
            if self.mesh_spec.world > 1:
                self.mesh = create_mesh(self.mesh_spec)
                if self.mesh_spec.model > 1:
                    # the model builds per-shard halo tables from this
                    model_cfg = dict(model_cfg)
                    model_cfg["num_model_shards"] = self.mesh_spec.model
                    config = dict(config)
                    config["model"] = model_cfg
                    self.config = config
                LOGGER.info(
                    "Mesh: data=%d model=%d ensemble=%d",
                    self.mesh_spec.data, self.mesh_spec.model,
                    self.mesh_spec.ensemble,
                )
        self.rollout_schedule = RolloutSchedule(training_cfg.get("rollout"))
        self.datamodule = DataModule(
            datasets,
            n_step_input=int(model_cfg.get("n_step_input", 2)),
            n_step_output=int(model_cfg.get("n_step_output", 1)),
            rollout=self.rollout_schedule.start,
            # dataloader.batch_size is PER data-parallel group (reference
            # semantics: per-GPU batch); the loader yields the global batch
            batch_size=int(config.get("dataloader", {}).get("batch_size", 1))
            * self.mesh_spec.data,
            validation_fraction=float(
                config.get("dataloader", {}).get("validation_fraction", 0.15)
            ),
        )
        self._setup_multihost_loading()

        # --- indices --------------------------------------------------
        self.data_indices = {
            name: IndexCollection(
                ds.name_to_index,
                forcing=data_cfg.get("forcing"),
                diagnostic=data_cfg.get("diagnostic"),
                target=data_cfg.get("target"),
            )
            for name, ds in datasets.items()
        }

        # --- model ----------------------------------------------------
        self.interface = AnemoiModelInterface(
            config=config,
            graph=self.graph,
            data_indices=self.data_indices,
            statistics=self.datamodule.statistics,
        )

        # --- output masks (LAM / stretched-grid) ----------------------
        from anemoi_tpu.training.masks import build_output_masks

        self.output_masks = build_output_masks(
            training_cfg.get("output_mask"), self.graph
        )

        # --- losses ---------------------------------------------------
        self.losses = {}
        for name, ds in datasets.items():
            scalers = create_scalers(
                training_cfg.get("scalers"),
                graph=self.graph,
                data_indices=self.data_indices[name],
                statistics=ds.statistics,
                statistics_tendencies=ds.statistics_tendencies,
                variable_groups=training_cfg.get("variable_groups"),
                metadata_variables=getattr(ds, "variables_metadata", None),
            )
            if name in self.output_masks:
                # score only inside the area of interest
                scalers["output_mask"] = (
                    ("grid",), self.output_masks[name].loss_scaler()
                )
            loss_cfg = dict(training_cfg.get("loss", {"name": "WeightedMSELoss"}))
            if name in self.output_masks and "scalers" in loss_cfg:
                loss_cfg["scalers"] = list(loss_cfg["scalers"]) + ["output_mask"]
            self.losses[name] = get_loss_function(
                loss_cfg, scalers, graph=self.graph, dataset=name,
                data_indices=self.data_indices[name],
                variables_metadata=getattr(ds, "variables_metadata", None),
            )
            from anemoi_tpu.training.losses.base import variable_scaling_summary

            # the effective per-variable loss weighting, once at startup
            # (ref losses/utils.py:38 print_variable_scaling)
            LOGGER.info(
                "variable loss scaling [%s]: %s",
                name,
                variable_scaling_summary(self.losses[name], self.data_indices[name]),
            )

        # --- optimizer / state ---------------------------------------
        self.lr_schedule = build_lr_schedule(training_cfg.get("lr", {}))
        self.tx = build_optimizer(training_cfg, self.lr_schedule)
        with self._mesh_ctx():
            params = self.interface.init_params()
        if self.mesh is not None:
            from anemoi_tpu.parallel.mesh import shard_params

            params = shard_params(self.mesh, params)

        # composable checkpoint-loading pipeline (sources/strategies/modifiers)
        pipeline_cfg = training_cfg.get("checkpoint_pipeline")
        if pipeline_cfg:
            import optax

            from anemoi_tpu.training.checkpoint_pipeline import (
                CheckpointContext,
                CheckpointPipeline,
            )

            ctx = CheckpointPipeline(list(pipeline_cfg)).run(
                CheckpointContext(params=params)
            )
            from anemoi_tpu.training.checkpoint_pipeline import (
                validate_pipeline_health,
            )

            validate_pipeline_health(ctx)
            params = jax.device_put(ctx.params)
            # variable order recorded by the loaded checkpoint, if any --
            # consumed by the CheckVariableOrder sanity callback
            self.ckpt_name_to_index = ctx.metadata.get("name_to_index")
            # unit/processing compatibility of checkpoint vs dataset variables
            # (ref utils/variables_metadata.py:38; raises on mismatched units)
            from anemoi_tpu.utils.variables_metadata import (
                check_variables_metadata_compatibility,
                extract_variables_metadata_from_checkpoint,
            )

            check_variables_metadata_compatibility(
                extract_variables_metadata_from_checkpoint(
                    ctx.metadata.get("bundle_metadata", {}), datasets.keys()
                ),
                {
                    name: {"variables_metadata": getattr(ds, "variables_metadata", None)}
                    for name, ds in datasets.items()
                },
            )
            if ctx.trainable_mask is not None:
                frozen_mask = jax.tree_util.tree_map(
                    lambda trainable: not trainable, ctx.trainable_mask
                )
                self.tx = optax.chain(
                    self.tx, optax.masked(optax.set_to_zero(), frozen_mask)
                )
            LOGGER.info("Checkpoint pipeline: %s", ctx.metadata)

        self.state = TrainState.create(params, self.tx)
        if (
            self.mesh is not None
            and bool((training_cfg.get("optimizer") or {}).get("zero", False))
            # multi-host checkpointing assumes process-0-addressable state;
            # keep opt state replicated across hosts for now
            and jax.process_count() == 1
        ):
            # ZeRO-1 equivalent: optimizer state sharded over the data axis
            # (ref optimization/optimizer/zero.yaml); GSPMD inserts the
            # gathers, per-device moment footprint drops ~1/data
            from anemoi_tpu.parallel.mesh import shard_opt_state

            self.state = shard_opt_state(self.mesh, self.state)
            LOGGER.info("ZeRO-style optimizer-state sharding over 'data'")
        n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
        LOGGER.info("Model has %.2fM parameters", n_params / 1e6)
        self.num_params = n_params

        self.ckpt = CheckpointManager(
            os.path.join(self.output_dir, "checkpoints"),
            max_to_keep=int(config.get("diagnostics", {}).get("checkpoint_keep", 3)),
        )
        if training_cfg.get("resume", False):
            restored = self.ckpt.restore(self.state)
            if restored is not None:
                self.state = restored
                LOGGER.info("Resumed from step %d", int(self.state.step))

        self._step_fns: Dict[int, Any] = {}  # rollout -> (train_step, eval_step)
        self._precompiling: set = set()  # rollouts compiling in the background
        self._precompile_threads: Dict[int, Any] = {}
        self._log_file = open(os.path.join(self.output_dir, "metrics.jsonl"), "a")

        from anemoi_tpu.training.callbacks import build_callbacks
        from anemoi_tpu.training.loggers import build_loggers

        self.callbacks = build_callbacks(
            config.get("diagnostics", {}).get("callbacks")
        )
        self.loggers = build_loggers(
            config.get("diagnostics", {}).get("loggers"), self.output_dir
        )
        for lg in self.loggers:
            lg.log_params({"config": config if isinstance(config, dict) else dict(config),
                           "num_params": int(n_params)})

    # ------------------------------------------------------------------
    def _mesh_ctx(self):
        """Ambient-mesh context so jitted steps (and the shard_map model
        parallelism inside them) see the trainer's mesh."""
        from contextlib import nullcontext

        return jax.set_mesh(self.mesh) if self.mesh is not None else nullcontext()

    def _shard_grid(self) -> bool:
        return bool(
            self.config.get("dataloader", {}).get("shard_grid", True)
        ) and self.mesh_spec.model > 1

    def _setup_multihost_loading(self) -> None:
        """Per-host data loading (reader-group equivalent): every process
        samples the same global anchor order, reads only the batch-row x
        grid-row block its devices own, and batches are assembled with
        `make_array_from_process_local_data` in `_put_batch`.
        Reference semantics: distributed/strategy.py:232-270 +
        multidataset.py:344-366 (each rank loads its grid slice)."""
        if self.mesh is None or jax.process_count() == 1:
            return
        from anemoi_tpu.parallel.distributed import host_local_slices
        from anemoi_tpu.parallel.mesh import batch_sharding

        sharding = batch_sharding(self.mesh, shard_grid=self._shard_grid())
        plan = {}
        for name, ds in self.datamodule.datasets.items():
            shape = (
                self.datamodule.batch_size, self.datamodule.window, 1,
                ds.num_grid_points, len(ds.variables),
            )
            slc = host_local_slices(sharding, shape)
            plan[name] = (slc[0], slc[3])  # (batch rows, grid rows)
        self.datamodule.local_plan = plan
        LOGGER.info(
            "multi-host loading: process %d/%d reads %s",
            jax.process_index(), jax.process_count(),
            {n: (f"B[{b.start}:{b.stop}]", f"G[{g.start}:{g.stop}]")
             for n, (b, g) in plan.items()},
        )

    def _put_batch(self, batch_np):
        if self.mesh is None:
            return jax.device_put(batch_np)
        from anemoi_tpu.parallel.mesh import batch_sharding

        sharding = batch_sharding(self.mesh, shard_grid=self._shard_grid())
        if jax.process_count() > 1:
            from anemoi_tpu.parallel.distributed import make_global_batch

            shapes = {
                ds: (
                    self.datamodule.batch_size, v.shape[1], v.shape[2],
                    self.datamodule.datasets[ds].num_grid_points, v.shape[4],
                )
                for ds, v in batch_np.items()
            }
            return make_global_batch(batch_np, sharding, shapes)
        return {ds: jax.device_put(v, sharding) for ds, v in batch_np.items()}

    def _precompile_rollout(self, rollout: int, batch_template) -> None:
        """AOT-compile the NEXT curriculum rollout's train step on a
        background thread while the current rollout trains.

        The rollout curriculum changes the scan length (and batch window), so
        each value is a fresh XLA program; on the slow axon compile service
        that stalls training for minutes at every increment (the reference
        has no such cost -- torch re-traces cheaply).  jax's AOT path
        (jit.lower(shapes).compile()) releases the GIL during the XLA
        compile, so the next program is built concurrently and dropped into
        the step cache before the curriculum reaches it."""
        if (
            rollout in self._step_fns
            or rollout in self._precompiling
            or self.mesh is not None  # sharded lowering needs committed inputs
        ):
            return
        self._precompiling.add(rollout)
        import threading

        model = self.interface.model
        window = model.n_step_input + rollout * model.n_step_output
        batch_sds = {
            ds: jax.ShapeDtypeStruct(
                (arr.shape[0], window) + tuple(arr.shape[2:]), arr.dtype
            )
            for ds, arr in batch_template.items()
        }
        state_sds = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)),
            self.state,
        )

        def work():
            try:
                t0 = time.time()
                train_step, eval_step = self._build_step_fns(rollout)
                jitted = getattr(train_step, "jitted", None)
                if jitted is None:  # e.g. transport steps: no AOT hook yet
                    self._step_fns[rollout] = (train_step, eval_step)
                    return
                bound = train_step.bound_args
                bound_sds = jax.tree_util.tree_map(
                    lambda x: jax.ShapeDtypeStruct(
                        jnp.shape(x), jnp.result_type(x)
                    ),
                    bound,
                )
                compiled = jitted.lower(state_sds, batch_sds, *bound_sds).compile()

                def compiled_step(state, batch, _c=compiled, _b=bound):
                    return _c(state, batch, *_b)

                self._step_fns[rollout] = (compiled_step, eval_step)
                LOGGER.info(
                    "Precompiled rollout %d train step in %.1fs (background)",
                    rollout, time.time() - t0,
                )
            except Exception:  # pragma: no cover - never kill training
                LOGGER.exception("Background precompile of rollout %d failed",
                                 rollout)
            finally:
                self._precompiling.discard(rollout)

        t = threading.Thread(
            target=work, name=f"precompile-rollout-{rollout}", daemon=True
        )
        self._precompile_threads[rollout] = t
        t.start()

    def _get_step_fns(self, rollout: int):
        t = self._precompile_threads.pop(rollout, None)
        if t is not None:
            t.join()  # compile mostly overlapped already; finish the tail
        if rollout not in self._step_fns:
            self._step_fns[rollout] = self._build_step_fns(rollout)
        return self._step_fns[rollout]

    def _build_step_fns(self, rollout: int):
        training_cfg = self.config.get("training", {})
        if str(training_cfg.get("task", "forecaster")) == "transport":
            from anemoi_tpu.models.transport.objectives import EDMConfig
            from anemoi_tpu.training.transport_step import (
                make_transport_step_fns,
            )

            tcfg = dict(training_cfg.get("transport", {}))
            edm_kwargs = {
                k: float(v) for k, v in dict(tcfg.get("edm", {})).items()
            }
            return make_transport_step_fns(
                self.interface,
                self.losses,
                objective=str(tcfg.get("objective", "edm")),
                edm=EDMConfig(**edm_kwargs),
                tendency=bool(tcfg.get("tendency", False)),
                interpolant_gamma=float(tcfg.get("interpolant_gamma", 0.0)),
                source=str(tcfg.get("source", "gaussian")),
                sigma_dist=tcfg.get("sigma_dist"),
                beta_schedule=str(tcfg.get("beta_schedule", "linear")),
                sigma_schedule=str(
                    tcfg.get("sigma_schedule", "brownian_bridge")
                ),
                precision=str(training_cfg.get("precision", "fp32")),
            )
        return make_step_fns(
            self.interface,
            self.losses,
            rollout=rollout,
            remat_rollout=bool(training_cfg.get("remat_rollout", True)),
            remat_policy=training_cfg.get("remat_policy"),
            ensemble_size=int(training_cfg.get("ensemble_size", 1)),
            output_masks=self.output_masks or None,
            precision=str(training_cfg.get("precision", "fp32")),
            fp32_head=bool(training_cfg.get("fp32_head", False)),
            task=str(training_cfg.get("task", "forecaster")),
            donate_state=bool(training_cfg.get("donate_state", False)),
            with_grad_norm=bool(training_cfg.get("log_grad_norm", True)),
        )

    def _log(self, record: Dict[str, Any]) -> None:
        if jax.process_count() > 1 and jax.process_index() != 0:
            return  # metrics/checkpoints are written by process 0 only
        self._log_file.write(json.dumps(record, default=float) + "\n")
        self._log_file.flush()

    # ------------------------------------------------------------------
    def train(self) -> Dict[str, Any]:
        cfg = self.config.get("training", {})
        max_epochs = int(cfg.get("max_epochs", 1))
        max_steps = int(cfg.get("max_steps", 10**9))
        log_interval = int(self.config.get("diagnostics", {}).get("log_interval", 10))
        ckpt_interval = int(self.config.get("diagnostics", {}).get("checkpoint_interval", 500))
        time_limit_s = float(cfg.get("time_limit_s", 0)) or None
        precompile = bool(cfg.get("precompile_rollouts", True))

        for cb in self.callbacks:
            cb.on_train_start(self)

        t_start = time.time()
        t_last_log = t_start
        steps_since_log = 0
        global_step = int(self.state.step)
        last_metrics = None  # device values; materialised lazily (no per-step sync)
        last_loss = float("nan")
        stop = False

        mesh_ctx = self._mesh_ctx()
        mesh_ctx.__enter__()
        for epoch in range(max_epochs):
            rollout = self.rollout_schedule.at_epoch(epoch)
            self.datamodule.set_rollout(rollout)
            train_step, _ = self._get_step_fns(rollout)

            t_epoch = time.time()
            n_batches = 0
            from anemoi_tpu.data.prefetch import maybe_prefetch

            batch_iter = maybe_prefetch(
                self.datamodule.train_batches(epoch),
                self._put_batch,
                int(self.config.get("dataloader", {}).get("prefetch", 2)),
            )
            # closed explicitly after the loop: an early break (max_steps,
            # time limit, callback stop) must stop + join the prefetch thread
            # rather than leave it to die inside native code at exit
            for batch in batch_iter:
                self.state, metrics = train_step(self.state, batch)
                last_metrics = metrics
                global_step += 1
                n_batches += 1

                if n_batches == 1 and precompile:
                    # overlap the NEXT curriculum rollout's XLA compile with
                    # this epoch's training (weak point of per-rollout jit:
                    # minutes-long axon compiles at each increment)
                    nxt = self.rollout_schedule.at_epoch(epoch + 1)
                    if nxt != rollout:
                        self._precompile_rollout(nxt, batch)

                for cb in self.callbacks:
                    cb.on_step(self, global_step, metrics)
                steps_since_log += 1
                if global_step % log_interval == 0:
                    loss = float(metrics["loss"])
                    last_loss = loss
                    now = time.time()
                    interval_steps = steps_since_log
                    steps_since_log = 0
                    rec = {
                        "step": global_step,
                        "epoch": epoch,
                        "rollout": rollout,
                        "loss": loss,
                        "grad_norm": float(metrics["grad_norm"]),
                        "lr": float(self.lr_schedule(global_step)),
                        "elapsed_s": now - t_start,
                        # throughput since the last log line (the reference's
                        # progress-bar it/s and per-sample rates)
                        "steps_per_s": interval_steps / max(now - t_last_log, 1e-9),
                        "samples_per_s": interval_steps
                        * self.datamodule.batch_size
                        / max(now - t_last_log, 1e-9),
                    }
                    t_last_log = now
                    self._log(rec)
                    for lg in self.loggers:
                        lg.log_metrics({k: v for k, v in rec.items()
                                        if isinstance(v, (int, float))}, global_step)
                    LOGGER.info(
                        "step %d epoch %d loss %.5f grad %.3f",
                        global_step, epoch, rec["loss"], rec["grad_norm"],
                    )
                if global_step % ckpt_interval == 0:
                    self.ckpt.save(global_step, self.state)
                if global_step >= max_steps:
                    stop = True
                    break
                if time_limit_s and (time.time() - t_start) > time_limit_s:
                    LOGGER.info("Time limit reached; stopping gracefully")
                    stop = True
                    break
                if any(cb.should_stop(self) for cb in self.callbacks):
                    LOGGER.info("Callback requested stop")
                    stop = True
                    break
            if hasattr(batch_iter, "close"):
                batch_iter.close()  # stop + join the prefetch thread
            if n_batches:
                self._log(
                    {
                        "epoch": epoch,
                        "epoch_time_s": time.time() - t_epoch,
                        "batches": n_batches,
                    }
                )
            # validation at epoch end
            val = self.validate(rollout)
            if val is not None:
                for cb in self.callbacks:
                    cb.on_validation(self, global_step, val)
                self._log({"step": global_step, "epoch": epoch, **val})
                for lg in self.loggers:
                    lg.log_metrics(val, global_step)
            if not stop and any(cb.should_stop(self) for cb in self.callbacks):
                LOGGER.info("Callback requested stop after validation")
                stop = True
            if stop:
                break
        mesh_ctx.__exit__(None, None, None)
        if last_metrics is not None:
            last_loss = float(last_metrics["loss"])

        self.ckpt.save(global_step, self.state)
        self.save_inference_checkpoint()
        for lg in self.loggers:
            lg.finalize()
        # drain outstanding background precompiles: a daemon thread killed at
        # interpreter exit mid-XLA-compile aborts the process (pthread
        # forced-unwind inside native code -> "FATAL: exception not rethrown")
        for t in list(self._precompile_threads.values()):
            t.join()
        self._precompile_threads.clear()
        return {"final_loss": last_loss, "steps": global_step}

    # ------------------------------------------------------------------
    def validate(self, rollout: Optional[int] = None) -> Optional[Dict[str, float]]:
        """Validation pass: scalar val_loss plus per-variable-group RMSE in
        post-processed space, keyed `rmse/<dataset>/<group>/<step>` (ref
        train/methods/base.py:1002-1100).  `training.validation_rollout`
        fixes the eval rollout independently of the training curriculum."""
        # a configured validation rollout overrides the training curriculum's
        rollout = int(
            self.config.get("training", {}).get("validation_rollout", 0)
        ) or rollout or self.rollout_schedule.start
        train_rollout = self.datamodule.rollout
        if rollout != train_rollout:
            self.datamodule.set_rollout(rollout)
        sums: Dict[str, float] = {}
        n = 0
        try:
            with self._mesh_ctx():
                _, eval_step = self._get_step_fns(rollout)
                for batch_np in self.datamodule.val_batches():
                    batch = self._put_batch(batch_np)
                    m = eval_step(self.state, batch)
                    for k, v in m.items():
                        sums[k] = sums.get(k, 0.0) + float(v)
                    n += 1
        finally:
            if rollout != train_rollout:
                self.datamodule.set_rollout(train_rollout)
        if not n:
            return None
        return {k: v / n for k, v in sums.items()}

    # ------------------------------------------------------------------
    def save_inference_checkpoint(self) -> None:
        from anemoi_tpu.parallel.distributed import fetch_replicated

        # collective on all processes (leaves may be sharded across hosts);
        # process 0 alone writes afterwards
        params_np = fetch_replicated(self.state.params)
        if jax.process_count() > 1 and jax.process_index() != 0:
            return
        di_config = {
            ds: {
                "name_to_index": idx.name_to_index,
                "forcing": idx.forcing,
                "diagnostic": idx.diagnostic,
                "target": idx.target,
            }
            for ds, idx in self.data_indices.items()
        }
        save_inference_checkpoint(
            os.path.join(self.output_dir, "inference"),
            params_np,
            self.config if isinstance(self.config, dict) else dict(self.config),
            di_config,
            self.datamodule.statistics,
            metadata={
                "num_params": int(self.num_params),
                # per-dataset variable metadata for load-time unit compat
                # checks (ref variables_metadata.py:23-35 layout)
                "dataset": {
                    name: {"variables_metadata": getattr(ds, "variables_metadata", None)}
                    for name, ds in self.datamodule.datasets.items()
                },
            },
        )

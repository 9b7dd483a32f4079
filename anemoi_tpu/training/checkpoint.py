"""Checkpointing: training state (orbax) + self-contained inference checkpoints.

Equivalents of:
- the reference's Lightning ckpt + AnemoiCheckpoint callback
  (/root/reference/training/src/anemoi/training/diagnostics/callbacks/checkpoint.py:30-211)
- the checkpoint loading strategies (weights-only / warm-start)
  (/root/reference/training/src/anemoi/training/checkpoint/loading/strategies.py)

The training checkpoint holds {params, opt_state, step} via orbax.
The inference checkpoint is a pickle-free bundle: flax-serialised params
(msgpack) + the full config + per-dataset metadata (statistics, name_to_index)
so inference can rebuild the AnemoiModelInterface without the training code
path.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization

try:
    import orbax.checkpoint as ocp

    HAVE_ORBAX = True
except Exception:  # pragma: no cover
    HAVE_ORBAX = False


class CheckpointManager:
    """Save/restore the training state; keeps the latest k checkpoints."""

    def __init__(self, directory: str, max_to_keep: int = 3) -> None:
        import jax

        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        # multi-host: orbax's CheckpointManager synchronises all processes on
        # save (global barriers), which conflicts with replicated-state
        # process-0-only writing; use the msgpack path there instead
        if HAVE_ORBAX and jax.process_count() == 1:
            self._mgr = ocp.CheckpointManager(
                self.directory,
                options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
            )
        else:
            self._mgr = None

    def save(self, step: int, state) -> None:
        import jax

        payload = {"params": state.params, "opt_state": state.opt_state, "step": state.step}
        if jax.process_count() > 1:
            # collective: every process materialises the full state (GSPMD may
            # have sharded leaves across hosts), then process 0 alone writes
            from anemoi_tpu.parallel.distributed import fetch_replicated

            payload = fetch_replicated(payload)
            if jax.process_index() != 0:
                return
        if self._mgr is not None:
            self._mgr.save(step, args=ocp.args.StandardSave(payload))
            self._mgr.wait_until_finished()
        else:  # msgpack fallback
            blob = serialization.to_bytes(payload)
            with open(os.path.join(self.directory, f"ckpt_{step}.msgpack"), "wb") as f:
                f.write(blob)

    def latest_step(self) -> Optional[int]:
        if self._mgr is not None:
            return self._mgr.latest_step()
        steps = [
            int(f[len("ckpt_") : -len(".msgpack")])
            for f in os.listdir(self.directory)
            if f.startswith("ckpt_") and f.endswith(".msgpack")
        ]
        return max(steps) if steps else None

    def restore(self, state, step: Optional[int] = None):
        """Restore into a template state (same pytree structure)."""
        step = step if step is not None else self.latest_step()
        if step is None:
            return None
        template = {"params": state.params, "opt_state": state.opt_state, "step": state.step}
        if self._mgr is not None:
            restored = self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        else:
            with open(os.path.join(self.directory, f"ckpt_{step}.msgpack"), "rb") as f:
                restored = serialization.from_bytes(template, f.read())
        return state.replace(
            params=restored["params"], opt_state=restored["opt_state"], step=restored["step"]
        )


def save_inference_checkpoint(
    path: str,
    params: Any,
    config: dict,
    data_indices_config: Dict[str, dict],
    statistics: Dict[str, Dict[str, np.ndarray]],
    metadata: Optional[dict] = None,
) -> None:
    """Self-contained inference bundle (ref checkpoint.py:161-211)."""
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "params.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(params)))
    np.savez(
        os.path.join(path, "statistics.npz"),
        **{
            f"{ds}|{key}": arr
            for ds, stats in statistics.items()
            for key, arr in stats.items()
        },
    )
    from anemoi_tpu.models.migrations import MIGRATOR

    from anemoi_tpu.utils.provenance import gather_provenance_info

    md = dict(metadata or {})
    # full environment snapshot (ref train.py:513 provenance_training)
    md.setdefault("provenance", gather_provenance_info())
    bundle = MIGRATOR.migrate(
        {
            "config": config,
            "data_indices": data_indices_config,
            "metadata": md,
        }
    )
    with open(os.path.join(path, "checkpoint.json"), "w") as f:
        json.dump(bundle, f, default=str)


def load_inference_checkpoint(path: str):
    """Rebuild (interface, params) from an inference bundle."""
    from anemoi_tpu.data_indices.collection import IndexCollection
    from anemoi_tpu.models.interface import AnemoiModelInterface

    from anemoi_tpu.models.migrations import MIGRATOR

    with open(os.path.join(path, "checkpoint.json")) as f:
        bundle = json.load(f)
    with open(os.path.join(path, "params.msgpack"), "rb") as f:
        raw_params = serialization.msgpack_restore(f.read())
    # apply pending format migrations (bundle + parameter tree) so old
    # checkpoints load on new code (ref models/migrations/migrator.py)
    bundle, raw_params = MIGRATOR.migrate(bundle, raw_params)
    stats_flat = np.load(os.path.join(path, "statistics.npz"))
    statistics: Dict[str, Dict[str, np.ndarray]] = {}
    for key in stats_flat.files:
        ds, stat = key.split("|")
        statistics.setdefault(ds, {})[stat] = stats_flat[key]

    data_indices = {
        ds: IndexCollection(
            {k: int(v) for k, v in di["name_to_index"].items()},
            forcing=di.get("forcing"),
            diagnostic=di.get("diagnostic"),
            target=di.get("target"),
        )
        for ds, di in bundle["data_indices"].items()
    }
    config = bundle["config"]

    # The recorded shard_strategy/num_model_shards are training-time
    # EXECUTION details, not part of the model's math: reconcile them with
    # the serving environment.  Multi-chip serving enters a mesh first
    # (docs/serving.md, test_predict_step_edges_shard_parity); without a
    # 'model' mesh axis the halo/Ulysses shard_maps cannot run, so degrade
    # to the single-device fast path (ref analogue: Lightning strategies are
    # dropped when the pickled inference model is loaded standalone).
    from anemoi_tpu.parallel.mesh import model_axis_size

    s = model_axis_size()
    mcfg = config.setdefault("model", {})
    if str(mcfg.get("shard_strategy", "none")) != "none":
        import logging

        _log = logging.getLogger(__name__)
        if s <= 1:
            # No 'model' mesh axis is visible HERE.  If you intended
            # multi-chip serving, enter the mesh BEFORE loading the bundle
            # (docs/serving.md) -- loading first silently serves
            # single-device, which presents as slow/OOM, not as an error.
            _log.warning(
                "checkpoint was trained with shard_strategy=%s "
                "(num_model_shards=%s) but no 'model' mesh axis is active; "
                "degrading to single-device serving. For sharded serving, "
                "enter the device mesh before loading the bundle "
                "(docs/serving.md).",
                mcfg.get("shard_strategy"), mcfg.get("num_model_shards"),
            )
            mcfg["shard_strategy"] = "none"
            mcfg.pop("num_model_shards", None)
        else:
            if int(mcfg.get("num_model_shards", s)) != s:
                _log.warning(
                    "re-basing num_model_shards %s -> %s to match the active "
                    "'model' mesh axis", mcfg.get("num_model_shards"), s,
                )
            mcfg["num_model_shards"] = s

    # the graph must be rebuilt/loaded from config
    from anemoi_tpu.graphs.create import GraphCreator

    graph_cfg = config.get("graph", {})
    graph_path = graph_cfg.get("save_path")
    if graph_path and os.path.exists(graph_path):
        from anemoi_tpu.graphs.graph import Graph

        graph = Graph.load(graph_path)
    else:
        graph = GraphCreator(graph_cfg.get("recipe", graph_cfg)).create()

    iface = AnemoiModelInterface(
        config=config,
        graph=graph,
        data_indices=data_indices,
        statistics=statistics,
        metadata=bundle.get("metadata"),
    )
    template = iface.init_params()
    params = serialization.from_state_dict(jax.device_get(template), raw_params)
    return iface, params


def freeze_submodules(params, names):
    """Return an optax mask pytree: True where trainable, False for frozen
    submodule names (ref utils/checkpoint.py freeze_submodule_by_name)."""
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    mask = {
        k: not any(n in k for n in names) for k in flat
    }
    return flax.traverse_util.unflatten_dict(mask)

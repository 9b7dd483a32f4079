"""Experiment loggers.

Equivalents of the reference's logger stack
(/root/reference/training/src/anemoi/training/diagnostics/mlflow/logger.py,
diagnostics/logger.py get_mlflow_logger/get_wandb_logger): a common interface
with a JSONL file logger always available and MLflow / Weights&Biases backends
activated when the client libraries exist (they are optional in this image).
Offline-mode MLflow runs can be synced later with `mlflow sync` tooling.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional

from anemoi_tpu.utils.registry import Registry

logger_registry = Registry("experiment logger")


class BaseLogger:
    def log_params(self, params: Dict[str, Any]) -> None: ...

    def log_metrics(self, metrics: Dict[str, float], step: int) -> None: ...

    def finalize(self) -> None: ...


@logger_registry.register("jsonl")
class JsonlLogger(BaseLogger):
    def __init__(self, output_dir: str, filename: str = "experiment.jsonl", **_):
        os.makedirs(output_dir, exist_ok=True)
        self._f = open(os.path.join(output_dir, filename), "a")

    def log_params(self, params):
        self._f.write(json.dumps({"type": "params", "params": params}, default=str) + "\n")
        self._f.flush()

    def log_metrics(self, metrics, step):
        self._f.write(
            json.dumps(
                {"type": "metrics", "step": step, "time": time.time(), **metrics},
                default=float,
            )
            + "\n"
        )
        self._f.flush()

    def finalize(self):
        self._f.close()


@logger_registry.register("mlflow")
class MLflowLogger(BaseLogger):
    """MLflow backend (ref mlflow/logger.py); requires the mlflow package."""

    def __init__(self, output_dir: str, tracking_uri: Optional[str] = None,
                 experiment: str = "anemoi-tpu", run_name: Optional[str] = None,
                 offline: bool = False, **_):
        try:
            import mlflow  # type: ignore
        except ImportError as e:  # pragma: no cover
            raise RuntimeError(
                "MLflowLogger requires the mlflow package (not in this image); "
                "use the jsonl logger instead"
            ) from e
        self.mlflow = mlflow
        uri = tracking_uri or (f"file://{os.path.abspath(output_dir)}/mlruns" if offline else None)
        if uri:
            mlflow.set_tracking_uri(uri)
        mlflow.set_experiment(experiment)
        self._run = mlflow.start_run(run_name=run_name)

    def log_params(self, params):
        flat = _flatten(params)
        # mlflow caps param count per call
        for i in range(0, len(flat), 90):
            self.mlflow.log_params(dict(list(flat.items())[i : i + 90]))

    def log_metrics(self, metrics, step):
        self.mlflow.log_metrics(
            {k.replace("/", "."): float(v) for k, v in metrics.items()}, step=step
        )

    def finalize(self):
        self.mlflow.end_run()


@logger_registry.register("mlflow_offline")
class OfflineMLflowLogger(BaseLogger):
    """MLflow FileStore-format offline logger -- no mlflow package needed;
    sync later with `anemoi-tpu-training mlflow sync` (ref offline mode of
    diagnostics/mlflow/logger.py + utils/mlflow_sync.py)."""

    def __init__(self, output_dir: str, experiment: str = "anemoi-tpu",
                 run_name: Optional[str] = None, system_metrics: bool = True,
                 system_metrics_interval_s: float = 30.0, **_):
        from anemoi_tpu.training.mlflow_store import (
            OfflineMLflowRun,
            SystemMetricsMonitor,
        )

        self.run = OfflineMLflowRun(
            os.path.join(output_dir, "mlruns"),
            experiment=experiment,
            run_name=run_name,
        )
        # environment provenance as run tags (ref train.py:513
        # provenance_training into run metadata)
        from anemoi_tpu.utils.provenance import gather_provenance_info

        prov = gather_provenance_info()
        for key, value in {
            "provenance.python": prov.get("python"),
            "provenance.platform": prov.get("platform"),
            "provenance.hostname": prov.get("hostname"),
            "provenance.git_commit": (prov.get("git") or {}).get("commit"),
            "provenance.git_dirty": (prov.get("git") or {}).get("dirty"),
            **{
                f"provenance.pkg.{name}": ver
                for name, ver in prov.get("packages", {}).items()
            },
        }.items():
            if value is not None:
                self.run.set_tag(key, str(value))
        self.monitor = None
        if system_metrics:
            self.monitor = SystemMetricsMonitor(
                self.run.log_metrics, interval_s=system_metrics_interval_s
            )
            self.monitor.start()

    def log_params(self, params):
        self.run.log_params(_flatten(params))

    def log_metrics(self, metrics, step):
        self.run.log_metrics({k: float(v) for k, v in metrics.items()}, step)

    def finalize(self):
        if self.monitor is not None:
            self.monitor.stop()
        self.run.finalize()


@logger_registry.register("wandb")
class WandbLogger(BaseLogger):
    """Weights & Biases backend (ref diagnostics/logger.py get_wandb_logger)."""

    def __init__(self, output_dir: str, project: str = "anemoi-tpu",
                 run_name: Optional[str] = None, offline: bool = True, **_):
        try:
            import wandb  # type: ignore
        except ImportError as e:  # pragma: no cover
            raise RuntimeError(
                "WandbLogger requires the wandb package (not in this image); "
                "use the jsonl logger instead"
            ) from e
        self.wandb = wandb
        self._run = wandb.init(
            project=project, name=run_name, dir=output_dir,
            mode="offline" if offline else "online",
        )

    def log_params(self, params):
        self._run.config.update(_flatten(params), allow_val_change=True)

    def log_metrics(self, metrics, step):
        self._run.log(metrics, step=step)

    def finalize(self):
        self._run.finish()


def _flatten(d: Dict, prefix: str = "") -> Dict[str, Any]:
    out = {}
    for k, v in d.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key + "."))
        else:
            out[key] = v
    return out


def build_loggers(configs, output_dir: str):
    """Build configured loggers; always includes the JSONL logger."""
    loggers = [JsonlLogger(output_dir)]
    for cfg in configs or []:
        cfg = dict(cfg)
        name = cfg.pop("name")
        if name == "jsonl":
            continue
        try:
            loggers.append(logger_registry.get(name)(output_dir=output_dir, **cfg))
        except RuntimeError as e:
            import logging

            if name == "mlflow":
                # no mlflow client in the image: degrade to the FileStore
                # offline logger, which the sync CLI can push later
                logging.getLogger(__name__).warning(
                    "mlflow package unavailable (%s); using the offline "
                    "FileStore logger", e,
                )
                cfg.pop("tracking_uri", None)
                cfg.pop("offline", None)
                loggers.append(OfflineMLflowLogger(output_dir=output_dir, **cfg))
            else:
                logging.getLogger(__name__).warning(
                    "Logger '%s' unavailable: %s", name, e
                )
    return loggers

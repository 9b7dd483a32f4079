"""Training callbacks.

Equivalents of the reference's diagnostics callback suite
(/root/reference/training/src/anemoi/training/diagnostics/callbacks/):
- EarlyStopping (stopping.py:100) on a monitored metric
- TimeLimit (stopping.py:25) graceful wall-clock stop
- WeightAveraging (weight_averaging.py:40,64): EMA / SWA of parameters
- RolloutEvalCallback (evaluation.py:22): extended-rollout validation metrics
- LearningRateMonitor

Callbacks receive the trainer and are invoked from its loop hooks
(on_step / on_validation / should_stop)."""

from __future__ import annotations

import time
from typing import Any, Dict, Optional

import jax
import numpy as np

from anemoi_tpu.utils.registry import Registry

callback_registry = Registry("callback")


class Callback:
    def on_step(self, trainer, step: int, metrics: Dict[str, Any]) -> None: ...

    def on_validation(self, trainer, step: int, val_metrics: Dict[str, Any]) -> None: ...

    def should_stop(self, trainer) -> bool:
        return False


@callback_registry.register("EarlyStopping")
class EarlyStopping(Callback):
    """Stop when the monitored metric stops improving (ref stopping.py:100)."""

    def __init__(self, monitor: str = "val_loss", patience: int = 5, min_delta: float = 0.0, mode: str = "min"):
        self.monitor = monitor
        self.patience = patience
        self.min_delta = min_delta
        self.sign = 1.0 if mode == "min" else -1.0
        self.best = float("inf")
        self.bad_epochs = 0
        self._stop = False

    def on_validation(self, trainer, step, val_metrics):
        value = val_metrics.get(self.monitor)
        if value is None:
            return
        score = self.sign * float(value)
        if score < self.best - self.min_delta:
            self.best = score
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs >= self.patience:
                self._stop = True

    def should_stop(self, trainer):
        return self._stop


@callback_registry.register("TimeLimit")
class TimeLimit(Callback):
    """Graceful stop near a wall-clock limit (ref stopping.py:25)."""

    def __init__(self, limit_s: float = 0.0, limit: Optional[str] = None):
        if limit:  # "HH:MM:SS" form
            parts = [float(p) for p in str(limit).split(":")]
            limit_s = sum(v * 60**i for i, v in enumerate(reversed(parts)))
        self.limit_s = float(limit_s)
        self.start = time.time()

    def should_stop(self, trainer):
        return self.limit_s > 0 and (time.time() - self.start) > self.limit_s


@callback_registry.register("WeightAveraging")
class WeightAveraging(Callback):
    """EMA (decay<1) or SWA (uniform running mean) of parameters
    (ref weight_averaging.py:40,64).  The averaged params are kept alongside
    the live ones and saved with the inference checkpoint."""

    def __init__(self, decay: float = 0.999, kind: str = "ema", update_every: int = 1):
        self.decay = decay
        self.kind = kind
        self.update_every = max(1, int(update_every))
        self.avg_params = None
        self._count = 0

        @jax.jit
        def _ema(avg, new, decay):
            return jax.tree_util.tree_map(
                lambda a, p: decay * a + (1.0 - decay) * p, avg, new
            )

        self._ema = _ema

    def on_step(self, trainer, step, metrics):
        if step % self.update_every:
            return
        params = trainer.state.params
        if self.avg_params is None:
            self.avg_params = params
            self._count = 1
            return
        if self.kind == "swa":
            self._count += 1
            decay = 1.0 - 1.0 / self._count
        else:
            decay = self.decay
        self.avg_params = self._ema(self.avg_params, params, decay)


@callback_registry.register("LearningRateMonitor")
class LearningRateMonitor(Callback):
    def on_step(self, trainer, step, metrics):
        metrics["lr"] = float(trainer.lr_schedule(step))


@callback_registry.register("RolloutEvalCallback")
class RolloutEvalCallback(Callback):
    """Extended-rollout validation metrics (ref evaluation.py:22)."""

    def __init__(self, rollout: int = 4, every_n_validations: int = 1, max_batches: int = 2):
        self.rollout = rollout
        self.every = max(1, every_n_validations)
        self.max_batches = max_batches
        self._fn = None
        self._n = 0

    def on_validation(self, trainer, step, val_metrics):
        self._n += 1
        if self._n % self.every:
            return
        from anemoi_tpu.training.metrics import make_rollout_eval_fn

        if self._fn is None:
            self._fn = make_rollout_eval_fn(trainer.interface, self.rollout)
        trainer.datamodule.set_rollout(max(self.rollout, trainer.datamodule.rollout))
        agg: Dict[str, list] = {}
        for i, batch_np in enumerate(trainer.datamodule.val_batches()):
            if i >= self.max_batches:
                break
            out = self._fn(trainer.state.params, jax.device_put(batch_np))
            for k, v in out.items():
                agg.setdefault(k, []).append(float(v))
        for k, vals in agg.items():
            val_metrics[k] = float(np.mean(vals))


def build_callbacks(configs) -> list:
    out = []
    for cfg in configs or []:
        out.append(callback_registry.build_from_config(dict(cfg)))
    return out

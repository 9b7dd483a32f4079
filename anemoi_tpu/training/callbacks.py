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
    def on_train_start(self, trainer) -> None: ...

    def on_step(self, trainer, step: int, metrics: Dict[str, Any]) -> None: ...

    def on_validation(self, trainer, step: int, val_metrics: Dict[str, Any]) -> None: ...

    def should_stop(self, trainer) -> bool:
        return False


@callback_registry.register("CheckVariableOrder")
class CheckVariableOrder(Callback):
    """Sanity-check the dataset variable order against the order recorded in
    the checkpoint the run was initialised from (ref callbacks/sanity.py:20).

    Fine-tuning with a dataset whose variables moved silently mis-trains;
    this raises before the first step instead."""

    def on_train_start(self, trainer) -> None:
        from anemoi_tpu.data_indices.collection import compare_variables

        ckpt_indices = getattr(trainer, "ckpt_name_to_index", None)
        for name, idx in trainer.data_indices.items():
            data_n2i = trainer.datamodule.name_to_index.get(name)
            if data_n2i is None:
                continue
            # model (interface) indices must always match the data
            compare_variables(idx.name_to_index, data_n2i)
            # checkpoint-recorded indices, when resuming/fine-tuning
            if ckpt_indices and name in ckpt_indices:
                compare_variables(ckpt_indices[name], data_n2i)


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


@callback_registry.register("PerTimestepMetrics")
class PerTimestepMetrics(Callback):
    """Validation metrics broken down by model OUTPUT timestep, for tasks
    that predict several timesteps per forward (temporal downscaling);
    ref diagnostics/callbacks/per_timestep_metrics.py:24. Logs
    ``rmse/<dataset>/<group>/t_<k>`` alongside the regular rollout keys."""

    def __init__(self, every_n_validations: int = 1, max_batches: int = 2):
        self.every = max(1, every_n_validations)
        self.max_batches = max_batches
        self._fn = None
        self._n = 0

    def on_validation(self, trainer, step, val_metrics):
        self._n += 1
        if self._n % self.every:
            return
        if trainer.interface.model.n_step_output <= 1:
            return  # single-output-step tasks have nothing to break down
        from anemoi_tpu.training.metrics import make_rollout_eval_fn

        if self._fn is None:
            self._fn = make_rollout_eval_fn(trainer.interface, rollout=1, per_timestep=True)
        agg: Dict[str, list] = {}
        for i, batch_np in enumerate(trainer.datamodule.val_batches()):
            if i >= self.max_batches:
                break
            out = self._fn(trainer.state.params, jax.device_put(batch_np))
            for k, v in out.items():
                if "/t_" in k:
                    agg.setdefault(k, []).append(float(v))
        for k, vals in agg.items():
            val_metrics[k] = float(np.mean(vals))


def build_callbacks(configs) -> list:
    out = []
    for cfg in configs or []:
        out.append(callback_registry.build_from_config(dict(cfg)))
    return out


# ----------------------------------------------------------------------
# plotting callbacks (ref diagnostics/callbacks/plot.py:372-1084)
# ----------------------------------------------------------------------
class BasePlotCallback(Callback):
    """Shared machinery: plots/ directory, async executor, cadence."""

    def __init__(self, every_n_validations: int = 1, async_plots: bool = True):
        from anemoi_tpu.training.plots import AsyncPlotExecutor, SyncPlotExecutor

        self.every = max(1, every_n_validations)
        self._n = 0
        self.executor = AsyncPlotExecutor() if async_plots else SyncPlotExecutor()

    def _due(self) -> bool:
        self._n += 1
        return self._n % self.every == 0

    def _plot_dir(self, trainer) -> str:
        import os

        return os.path.join(trainer.output_dir, "plots")

    def _sample(self, trainer):
        """One validation batch: (lats, lons, pred_phys, truth_phys, names).

        pred/truth are [G, V_out] physical-space fields of the first sample's
        first output step."""
        batch_np = next(iter(trainer.datamodule.val_batches()))
        batch = {ds: jax.device_put(v) for ds, v in batch_np.items()}
        out = trainer.interface.predict_step(trainer.state.params, batch)
        ds = sorted(batch)[0]
        idx = trainer.data_indices[ds]
        m = trainer.interface.model.n_step_input
        cols = np.asarray([idx.name_to_index[n]
                           for n in idx.model.output.ordered_names])
        truth = np.asarray(batch_np[ds][0, m, 0])[:, cols]  # [G, V_out]
        pred = np.asarray(out[ds])[0, 0, 0]  # [G, V_out]
        coords = trainer.graph[ds].coords
        names = idx.model.output.ordered_names
        self._last_members = np.asarray(out[ds])[0, 0]  # [E, G, V_out]
        self._last_dataset = ds
        return coords[:, 0], coords[:, 1], pred, truth, names

    def _focus(self, trainer, lats, lons, *fields):
        """Apply the configured focus-area mask (ref geospatial/focus_area.py)
        to latlons + [..., G, V] fields; no-op without a ``focus_area`` config."""
        mask = getattr(self, "_spatial_mask", None)
        if mask is None:
            from anemoi_tpu.training.plots import build_spatial_mask

            mask = self._spatial_mask = build_spatial_mask(
                **(getattr(self, "focus_area", None) or {})
            )
        return mask.apply(trainer.graph, self._last_dataset, lats, lons, *fields), mask.tag


@callback_registry.register("PlotSample")
class PlotSample(BasePlotCallback):
    """Truth / prediction / error maps for selected variables each
    validation (ref BatchOutputPlot, plot.py:917)."""

    def __init__(self, variables: Optional[list] = None, max_vars: int = 4,
                 every_n_validations: int = 1, async_plots: bool = True,
                 focus_area: Optional[dict] = None,
                 colormaps: Optional[list] = None):
        super().__init__(every_n_validations, async_plots)
        self.variables = variables
        self.max_vars = max_vars
        self.focus_area = focus_area
        self.colormaps = colormaps

    def on_validation(self, trainer, step, val_metrics):
        if not self._due():
            return
        import os

        from anemoi_tpu.training.plots import (
            build_colormaps,
            plot_sample_maps,
            save_figure,
        )

        lats, lons, pred, truth, names = self._sample(trainer)
        (lats, lons, pred, truth), tag = self._focus(trainer, lats, lons, pred, truth)
        sel = [names.index(v) for v in self.variables] if self.variables else (
            list(range(min(self.max_vars, len(names))))
        )
        cmaps = build_colormaps(self.colormaps)
        path = os.path.join(self._plot_dir(trainer), f"sample{tag}_step{step:07d}.png")
        self.executor.schedule(
            lambda: save_figure(
                plot_sample_maps(lats, lons, pred[:, sel], truth[:, sel],
                                 [names[i] for i in sel], cmaps=cmaps),
                path,
            )
        )


@callback_registry.register("PlotEnsembleSample")
class PlotEnsembleSample(BasePlotCallback):
    """Per-member / ensemble-mean / spread maps for ensemble models
    (ref evaluation/plotting/ensemble.py plot_predicted_ensemble)."""

    def __init__(self, variables: Optional[list] = None, max_vars: int = 2,
                 max_members: int = 4, every_n_validations: int = 1,
                 async_plots: bool = True, focus_area: Optional[dict] = None):
        super().__init__(every_n_validations, async_plots)
        self.variables = variables
        self.max_vars = max_vars
        self.max_members = max_members
        self.focus_area = focus_area

    def on_validation(self, trainer, step, val_metrics):
        if not self._due():
            return
        import os

        from anemoi_tpu.training.plots import plot_ensemble_maps, save_figure

        lats, lons, _, truth, names = self._sample(trainer)
        members = self._last_members  # [E, G, V]
        if members.shape[0] <= 1:
            return  # deterministic model: nothing ensemble-ish to show
        (lats, lons, members, truth), tag = self._focus(
            trainer, lats, lons, members, truth
        )
        sel = [names.index(v) for v in self.variables] if self.variables else (
            list(range(min(self.max_vars, len(names))))
        )
        for i in sel:
            path = os.path.join(
                self._plot_dir(trainer),
                f"ensemble_{names[i]}{tag}_step{step:07d}.png",
            )
            self.executor.schedule(
                lambda m=members[:, :, i], t=truth[:, i], n=names[i], p=path: save_figure(
                    plot_ensemble_maps(lats, lons, m, t, n, self.max_members), p
                )
            )


@callback_registry.register("PlotSpectrum")
class PlotSpectrum(BasePlotCallback):
    """Per-degree spherical-harmonic power spectra of prediction vs truth
    (ref SpectrumPlot).  ``gaussian_n``/``grid_kind`` select the SHT; for
    non-ring grids the callback is a no-op with a warning."""

    def __init__(self, gaussian_n: int = 0, grid_kind: str = "octahedral",
                 variables: Optional[list] = None, max_vars: int = 3,
                 every_n_validations: int = 1, async_plots: bool = True):
        super().__init__(every_n_validations, async_plots)
        self.gaussian_n = gaussian_n
        self.grid_kind = grid_kind
        self.variables = variables
        self.max_vars = max_vars

    def on_validation(self, trainer, step, val_metrics):
        if not self._due():
            return
        import os

        import jax.numpy as jnp

        from anemoi_tpu.ops.spectral import GaussianSHT, ReducedSHT
        from anemoi_tpu.training.plots import plot_power_spectra, save_figure

        lats, lons, pred, truth, names = self._sample(trainer)
        if self.grid_kind == "full":
            sht = GaussianSHT.create(self.gaussian_n)
            n_exp = sht.nlat * sht.nlon
        else:
            sht = ReducedSHT.create(self.gaussian_n, kind=self.grid_kind)
            n_exp = sht.n_points
        if pred.shape[0] != n_exp:
            import logging

            logging.getLogger(__name__).warning(
                "PlotSpectrum: grid size %d != %s n=%d (%d points); skipping",
                pred.shape[0], self.grid_kind, self.gaussian_n, n_exp,
            )
            return
        sel = [names.index(v) for v in self.variables] if self.variables else (
            list(range(min(self.max_vars, len(names))))
        )
        spectra = {}
        for i in sel:
            f_p = jnp.nan_to_num(jnp.asarray(pred[:, i]))
            f_t = jnp.nan_to_num(jnp.asarray(truth[:, i]))
            if self.grid_kind == "full":
                f_p = f_p.reshape(sht.nlat, sht.nlon)
                f_t = f_t.reshape(sht.nlat, sht.nlon)
            spectra[f"{names[i]} pred"] = np.asarray(sht.power_spectrum(f_p))
            spectra[f"{names[i]} truth"] = np.asarray(sht.power_spectrum(f_t))
        path = os.path.join(self._plot_dir(trainer), f"spectrum_step{step:07d}.png")
        self.executor.schedule(
            lambda: save_figure(plot_power_spectra(spectra), path)
        )


@callback_registry.register("PlotHistogram")
class PlotHistogram(BasePlotCallback):
    """Predicted-vs-truth value histograms (ref HistogramPlot)."""

    def __init__(self, variables: Optional[list] = None, max_vars: int = 4,
                 every_n_validations: int = 1, async_plots: bool = True,
                 focus_area: Optional[dict] = None):
        super().__init__(every_n_validations, async_plots)
        self.variables = variables
        self.max_vars = max_vars
        self.focus_area = focus_area

    def on_validation(self, trainer, step, val_metrics):
        if not self._due():
            return
        import os

        from anemoi_tpu.training.plots import plot_histograms, save_figure

        lats, lons, pred, truth, names = self._sample(trainer)
        (lats, lons, pred, truth), tag = self._focus(trainer, lats, lons, pred, truth)
        sel = [names.index(v) for v in self.variables] if self.variables else (
            list(range(min(self.max_vars, len(names))))
        )
        path = os.path.join(self._plot_dir(trainer), f"histogram{tag}_step{step:07d}.png")
        self.executor.schedule(
            lambda: save_figure(
                plot_histograms(pred[:, sel], truth[:, sel],
                                [names[i] for i in sel]),
                path,
            )
        )


@callback_registry.register("GraphTrainableFeaturesPlot")
class GraphTrainableFeaturesPlot(BasePlotCallback):
    """Norm of the trainable node embeddings on the map (ref
    GraphFeaturePlot, plot.py:523)."""

    def __init__(self, every_n_validations: int = 1, async_plots: bool = True):
        super().__init__(every_n_validations, async_plots)

    def on_validation(self, trainer, step, val_metrics):
        if not self._due():
            return
        import os

        import flax

        from anemoi_tpu.training.plots import _plt, plot_field_map, save_figure

        flat = flax.traverse_util.flatten_dict(trainer.state.params["params"])
        feats = {
            path[-2]: np.asarray(v)
            for path, v in flat.items()
            if "node_attributes" in str(path[-2]) and path[-1] == "trainable"
        }
        if not feats:
            return

        def render():
            plt = _plt()
            fig, axes = plt.subplots(len(feats), 1, figsize=(6, 3 * len(feats)),
                                     squeeze=False)
            for ax, (name, emb) in zip(axes[:, 0], sorted(feats.items())):
                node_set = name.replace("node_attributes_", "")
                coords = trainer.graph[node_set].coords
                plot_field_map(
                    coords[:, 0], coords[:, 1], np.linalg.norm(emb, axis=-1),
                    f"|trainable| {node_set}", ax=ax,
                )
            fig.tight_layout()
            save_figure(
                fig,
                os.path.join(self._plot_dir(trainer), f"node_features_step{step:07d}.png"),
            )

        self.executor.schedule(render)


@callback_registry.register("LossCurvePlot")
class LossCurvePlot(BasePlotCallback):
    """Loss-vs-step curve rendered from metrics.jsonl (ref LossCurvePlot,
    plot.py:604)."""

    def __init__(self, every_n_validations: int = 1, async_plots: bool = True):
        super().__init__(every_n_validations, async_plots)

    def on_validation(self, trainer, step, val_metrics):
        if not self._due():
            return
        import json
        import os

        from anemoi_tpu.training.plots import plot_loss_curve, save_figure

        path = os.path.join(trainer.output_dir, "metrics.jsonl")
        if not os.path.exists(path):
            return
        steps, losses, vsteps, vlosses = [], [], [], []
        with open(path) as f:
            for line in f:
                rec = json.loads(line)
                if "loss" in rec and "step" in rec:
                    steps.append(rec["step"])
                    losses.append(rec["loss"])
                if "val_loss" in rec and "step" in rec:
                    vsteps.append(rec["step"])
                    vlosses.append(rec["val_loss"])
        if not steps:
            return
        out = os.path.join(self._plot_dir(trainer), f"loss_curve_step{step:07d}.png")
        self.executor.schedule(
            lambda: save_figure(
                plot_loss_curve(steps, losses, vsteps, vlosses), out
            )
        )

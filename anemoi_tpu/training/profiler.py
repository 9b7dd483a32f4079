"""Training profiler.

Equivalent of /root/reference/training/src/anemoi/training/train/profiler.py:35
(AnemoiProfiler) + diagnostics/profilers.py:285 (BenchmarkProfiler): wraps a
short training run with timing + memory accounting and writes the reference's
report set (speed report, time report, memory report, system report) as JSON,
optionally alongside a `jax.profiler` trace for deep dives.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional

import jax
import numpy as np


class BenchmarkProfiler:
    """Times train/val steps and collects device/host memory statistics."""

    def __init__(self, output_dir: str, trace: bool = False) -> None:
        self.output_dir = output_dir
        os.makedirs(output_dir, exist_ok=True)
        self.trace = trace
        self.step_times: list = []
        self.val_times: list = []
        self.section_times: Dict[str, list] = {}
        self._t0: Optional[float] = None

    # -- timing hooks ---------------------------------------------------
    def start_step(self) -> None:
        self._t0 = time.perf_counter()

    def end_step(self, validation: bool = False) -> None:
        if self._t0 is None:
            return
        dt = time.perf_counter() - self._t0
        (self.val_times if validation else self.step_times).append(dt)
        self._t0 = None

    def section(self, name: str):
        """Accumulate wall time for a named phase (the reference's per-hook
        time report, diagnostics/profilers.py time_report): use as
        ``with prof.section("dataloader"): ...``."""
        import contextlib

        @contextlib.contextmanager
        def _timer():
            t0 = time.perf_counter()
            try:
                yield
            finally:
                self.section_times.setdefault(name, []).append(
                    time.perf_counter() - t0
                )

        return _timer()

    # -- reports --------------------------------------------------------
    def time_report(self) -> Dict[str, Any]:
        """Per-phase aggregation: total/mean/count per named section."""
        out: Dict[str, Any] = {}
        for name, times in self.section_times.items():
            arr = np.asarray(times)
            out[name] = {
                "total_s": float(arr.sum()),
                "mean_s": float(arr.mean()),
                "count": int(len(arr)),
            }
        total = sum(v["total_s"] for v in out.values())
        for v in out.values():
            v["pct"] = round(100.0 * v["total_s"] / total, 1) if total else 0.0
        return out

    def speed_report(self, samples_per_step: int = 1, grid_points: int = 0) -> Dict[str, Any]:
        times = np.asarray(self.step_times[1:] or self.step_times)  # drop compile step
        if len(times) == 0:
            return {}
        report = {
            "training_avg_throughput": float(1.0 / times.mean()),
            "training_avg_throughput_per_sample": float(samples_per_step / times.mean()),
            "avg_time_per_batch_s": float(times.mean()),
            "p50_time_per_batch_s": float(np.percentile(times, 50)),
            "p95_time_per_batch_s": float(np.percentile(times, 95)),
            "num_steps": int(len(times)),
        }
        if grid_points:
            report["grid_points_per_s"] = float(grid_points * samples_per_step / times.mean())
        if self.val_times:
            v = np.asarray(self.val_times)
            report["validation_avg_throughput"] = float(1.0 / v.mean())
        return report

    def memory_report(self) -> Dict[str, Any]:
        report: Dict[str, Any] = {}
        try:
            for dev in jax.local_devices():
                stats = dev.memory_stats()
                if stats:
                    report[str(dev)] = {
                        "bytes_in_use": stats.get("bytes_in_use"),
                        "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                        "bytes_limit": stats.get("bytes_limit"),
                    }
        except Exception:
            pass
        try:
            with open("/proc/self/status") as f:
                for line in f:
                    if line.startswith(("VmRSS", "VmHWM")):
                        key, val = line.split(":", 1)
                        report[f"host_{key.lower()}_kb"] = int(val.strip().split()[0])
        except OSError:
            pass
        return report

    def system_report(self) -> Dict[str, Any]:
        import platform

        return {
            "platform": platform.platform(),
            "python": platform.python_version(),
            "jax": jax.__version__,
            "devices": [str(d) for d in jax.devices()],
            "cpu_count": os.cpu_count(),
        }

    def write_reports(self, extra: Optional[Dict] = None) -> str:
        reports = {
            "speed": self.speed_report(),
            "time": self.time_report(),
            "memory": self.memory_report(),
            "system": self.system_report(),
        }
        if extra:
            reports.update(extra)
        path = os.path.join(self.output_dir, "profiler_report.json")
        with open(path, "w") as f:
            json.dump(reports, f, indent=1, default=str)
        return path

    # -- trace ----------------------------------------------------------
    def __enter__(self):
        if self.trace:
            jax.profiler.start_trace(os.path.join(self.output_dir, "trace"))
        return self

    def __exit__(self, *exc):
        if self.trace:
            jax.profiler.stop_trace()
        return False


def profile_training(trainer, num_steps: int = 20, trace: bool = False) -> Dict[str, Any]:
    """Run a short profiled training loop (AnemoiProfiler equivalent)."""
    prof = BenchmarkProfiler(os.path.join(trainer.output_dir, "profile"), trace=trace)
    rollout = trainer.rollout_schedule.start
    trainer.datamodule.set_rollout(rollout)
    train_step, _ = trainer._get_step_fns(rollout)
    n = 0
    with prof:
        batches = iter(trainer.datamodule.train_batches(epoch=0))
        while n < num_steps:
            with prof.section("dataloader"):
                try:
                    batch_np = next(batches)
                except StopIteration:
                    break
            with prof.section("transfer"):
                batch = jax.device_put(batch_np)
            prof.start_step()
            with prof.section("train_step"):
                trainer.state, metrics = train_step(trainer.state, batch)
                jax.block_until_ready(metrics["loss"])
            prof.end_step()
            n += 1
    grid_points = sum(
        trainer.interface.model_graph.num_nodes[ds]
        for ds in trainer.data_indices
    )
    report_path = prof.write_reports(
        {"config": {"rollout": rollout, "steps": n, "grid_points": grid_points}}
    )
    result = {"report": report_path, **prof.speed_report(grid_points=grid_points)}
    # dataloader throughput, tracked like the reference's dataloader benchmark
    # (benchmark_server.py:717-748)
    dl = prof.time_report().get("dataloader")
    if dl and dl["total_s"] > 0:
        result["dataloader_batches_per_s"] = dl["count"] / dl["total_s"]
    return result

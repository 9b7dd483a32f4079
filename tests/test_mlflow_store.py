"""MLflow offline FileStore logger, REST sync, and system metrics
(mirrors the reference's diagnostics/mlflow + utils/mlflow_sync coverage)."""

import json
import os
import threading
import time
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from anemoi_tpu.training.mlflow_store import (
    OfflineMLflowRun,
    SystemMetricsMonitor,
    read_offline_run,
    sample_system_metrics,
    sync_offline_run,
)


def make_run(tmp_path, metrics=((1.0, 0), (0.5, 1))):
    run = OfflineMLflowRun(str(tmp_path / "mlruns"), experiment="exp",
                           run_name="r1", tags={"git": "abc"})
    run.log_params({"model.num_channels": 16, "training.lr.rate": 1e-3})
    for v, s in metrics:
        run.log_metric("train/loss", v, step=s)
    run.finalize()
    return run


def test_offline_store_layout_roundtrip(tmp_path):
    run = make_run(tmp_path)
    # FileStore layout: mlruns/<exp_id>/<run_id>/{meta.yaml,metrics,params,tags}
    assert os.path.exists(os.path.join(run.run_dir, "meta.yaml"))
    data = read_offline_run(run.run_dir)
    assert data["params"]["model.num_channels"] == "16"
    assert data["tags"]["git"] == "abc"
    assert data["tags"]["mlflow.runName"] == "r1"
    assert [m["value"] for m in data["metrics"]] == [1.0, 0.5]
    assert [m["step"] for m in data["metrics"]] == [0, 1]
    assert data["meta"]["run_id"] == run.run_id
    assert data["meta"]["end_time"] not in ("null", "", None)

    # a second run in the same experiment reuses the experiment id
    run2 = OfflineMLflowRun(str(tmp_path / "mlruns"), experiment="exp")
    assert run2.experiment_id == run.experiment_id
    # a different experiment gets a fresh id
    run3 = OfflineMLflowRun(str(tmp_path / "mlruns"), experiment="other")
    assert run3.experiment_id != run.experiment_id


def test_metric_key_sanitised(tmp_path):
    run = OfflineMLflowRun(str(tmp_path / "mlruns"))
    run.log_metric("val/mse/data/sfc/1", 0.25, step=3)
    data = read_offline_run(run.run_dir)
    assert data["metrics"][0]["key"] == "val.mse.data.sfc.1"


class _StubMLflow(BaseHTTPRequestHandler):
    """Just enough of the MLflow REST surface for sync tests."""

    calls = []

    def log_message(self, *a):  # silence
        pass

    def _reply(self, payload):
        body = json.dumps(payload).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self):
        length = int(self.headers.get("Content-Length", 0))
        payload = json.loads(self.rfile.read(length) or b"{}")
        type(self).calls.append(
            (self.path, payload, self.headers.get("Authorization"))
        )
        if self.path.endswith("experiments/create"):
            self._reply({"experiment_id": "7"})
        elif self.path.endswith("runs/create"):
            self._reply({"run": {"info": {"run_id": "serverrun"}}})
        else:
            self._reply({})

    do_GET = do_POST


@pytest.fixture()
def stub_server():
    _StubMLflow.calls = []
    srv = HTTPServer(("127.0.0.1", 0), _StubMLflow)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_sync_offline_run(tmp_path, stub_server):
    run = make_run(tmp_path)
    run_id = sync_offline_run(run.run_dir, stub_server, token="sekrit")
    assert run_id == "serverrun"
    paths = [p for p, _, _ in _StubMLflow.calls]
    assert any(p.endswith("experiments/create") for p in paths)
    assert any(p.endswith("runs/create") for p in paths)
    assert any(p.endswith("runs/log-batch") for p in paths)
    assert any(p.endswith("runs/update") for p in paths)
    # auth header carried on every call
    assert all(a == "Bearer sekrit" for _, _, a in _StubMLflow.calls)
    # the log-batch call carries both metrics and params
    batch = next(pl for p, pl, _ in _StubMLflow.calls if p.endswith("log-batch"))
    assert len(batch["metrics"]) == 2
    assert {p["key"] for p in batch["params"]} == {
        "model.num_channels", "training.lr.rate"
    }
    # the experiment routes by the name RECORDED in the run (no --experiment)
    create = next(pl for p, pl, _ in _StubMLflow.calls
                  if p.endswith("experiments/create"))
    assert create["name"] == "exp"


def test_sync_paginates_params_beyond_rest_cap(tmp_path, stub_server):
    """>100 params must paginate across log-batch calls, not drop (REST caps
    a batch at 100 params / 1000 metrics)."""
    run = OfflineMLflowRun(str(tmp_path / "mlruns"), experiment="big")
    run.log_params({f"cfg.k{i}": i for i in range(250)})
    run.log_metric("loss", 1.0, 0)
    run.finalize()
    sync_offline_run(run.run_dir, stub_server)
    batches = [pl for path, pl, _ in _StubMLflow.calls if path.endswith("log-batch")]
    keys = {p["key"] for pl in batches for p in pl.get("params", [])}
    assert len(keys) == 250
    assert all(len(pl.get("params", [])) <= 100 for pl in batches)


def test_system_metrics_sample_and_monitor():
    sample = sample_system_metrics()
    assert sample["sys/process_rss_mib"] > 1.0
    assert 0.0 <= sample["sys/host_mem_used_pct"] <= 100.0

    seen = []
    mon = SystemMetricsMonitor(lambda m, s: seen.append((m, s)), interval_s=0.05)
    mon.start()
    time.sleep(0.3)
    mon.stop()
    assert seen, "monitor never sampled"
    metrics, step = seen[0]
    assert "sys/cpu_util_pct" in metrics and step == 1


def test_offline_logger_via_build_loggers(tmp_path):
    """'mlflow' logger degrades to the offline FileStore when the client
    package is absent (it is absent in this image)."""
    from anemoi_tpu.training.loggers import OfflineMLflowLogger, build_loggers

    loggers = build_loggers(
        [{"name": "mlflow", "experiment": "exp", "system_metrics": False}],
        str(tmp_path),
    )
    offline = [lg for lg in loggers if isinstance(lg, OfflineMLflowLogger)]
    assert offline, [type(lg) for lg in loggers]
    offline[0].log_params({"a": {"b": 1}})
    offline[0].log_metrics({"train/loss": 2.0}, step=1)
    offline[0].finalize()
    data = read_offline_run(offline[0].run.run_dir)
    assert data["params"]["a.b"] == "1"
    assert data["metrics"][0]["key"] == "train.loss"

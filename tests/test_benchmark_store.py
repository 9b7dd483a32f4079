import numpy as np
import pytest

from anemoi_tpu.training.benchmark_store import BenchmarkStore, current_commit


def test_push_get_compare(tmp_path):
    store = BenchmarkStore(str(tmp_path / "bench"), repo="/root/repo")
    commit = store.push({"throughput": 100.0})
    assert store.get(commit) == {"throughput": 100.0}
    # merge on second push
    store.push({"memory": 5.0}, commit=commit)
    assert store.get(commit) == {"throughput": 100.0, "memory": 5.0}


def test_find_latest_shared_commit(tmp_path):
    store = BenchmarkStore(str(tmp_path / "bench"), repo="/root/repo")
    # store results for an ancestor commit (HEAD~1)
    import subprocess

    parent = subprocess.run(
        ["git", "rev-parse", "HEAD~1"], cwd="/root/repo",
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    store.push({"throughput": 50.0}, commit=parent)
    assert store.find_latest_shared_commit() == parent
    cmp = store.compare({"throughput": 75.0})
    assert cmp["throughput"]["baseline"] == 50.0
    assert cmp["throughput"]["ratio"] == 1.5


def test_compare_walks_past_keyless_ancestors(tmp_path):
    """Reproduces the BENCH_r04 null-baseline failure: the NEAREST ancestor
    stored only sweep-tagged keys (e.g. block-sweep runs), which used to stop
    the ancestor search and null out every flagship comparison.  The search
    must now resolve each key at the most recent ancestor that has IT."""
    from anemoi_tpu.training.benchmark_store import commit_ancestry

    store = BenchmarkStore(str(tmp_path / "bench"), repo="/root/repo")
    ancestry = commit_ancestry("/root/repo")
    near, far = ancestry[1], ancestry[2]
    # flagship series stored two commits back ...
    store.push({"grid_points_per_s": 1000.0, "step_time_ms": 100.0}, commit=far)
    # ... then a block-sweep run stored ONLY tagged keys at the nearest ancestor
    store.push({"o96-L5-512ch-16l-paged-r1-block.256,256,256/step_time_ms": 90.0},
               commit=near)

    # key-unaware search still finds the nearest file (back-compat) ...
    assert store.find_latest_shared_commit() == near
    # ... but the key-aware search skips it
    assert (
        store.find_latest_shared_commit(required_keys={"grid_points_per_s"}) == far
    )

    cmp = store.compare({"grid_points_per_s": 1200.0, "step_time_ms": 95.0})
    assert cmp["grid_points_per_s"]["baseline"] == 1000.0
    assert cmp["grid_points_per_s"]["baseline_commit"] == far
    assert cmp["grid_points_per_s"]["ratio"] == pytest.approx(1.2)
    # per-key resolution: a key stored at BOTH commits resolves to the nearest
    store.push({"step_time_ms": 98.0}, commit=near)
    cmp = store.compare({"step_time_ms": 49.0})
    assert cmp["step_time_ms"]["baseline"] == 98.0
    assert cmp["step_time_ms"]["baseline_commit"] == near


def test_compare_without_baseline(tmp_path):
    store = BenchmarkStore(str(tmp_path / "bench"), repo="/root/repo")
    cmp = store.compare({"x": 1.0})
    assert cmp["x"]["baseline"] is None


def test_remote_benchmark_store(tmp_path):
    """Remote (MLflow-backed) store shares baselines across machines
    (ref benchmark_server.py:529 RemoteBenchmarkServer): push creates one
    tagged run per commit; a second machine (fresh local dir) fetches the
    same metrics; compare works against the fetched remote baseline."""
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from anemoi_tpu.training.benchmark_store import (
        RemoteBenchmarkStore,
        commit_ancestry,
    )

    state = {"runs": {}}  # run_id -> {"tags": {...}, "metrics": {...}}

    class Stub(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _reply(self, payload):
            body = json.dumps(payload).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            payload = json.loads(self.rfile.read(n) or b"{}")
            if self.path.endswith("experiments/create"):
                self._reply({"experiment_id": "1"})
            elif self.path.endswith("runs/create"):
                rid = f"run{len(state['runs'])}"
                tags = {t["key"]: t["value"] for t in payload.get("tags", [])}
                state["runs"][rid] = {"tags": tags, "metrics": {}}
                self._reply({"run": {"info": {"run_id": rid}}})
            elif self.path.endswith("runs/log-batch"):
                run = state["runs"][payload["run_id"]]
                for m in payload.get("metrics", []):
                    run["metrics"][m["key"]] = m["value"]
                self._reply({})
            elif self.path.endswith("runs/search"):
                flt = payload.get("filter", "")
                out = []
                for rid, run in state["runs"].items():
                    commit = run["tags"].get("commit", "")
                    if not flt or f"'{commit}'" in flt:
                        out.append(
                            {
                                "info": {"run_id": rid},
                                "data": {
                                    "metrics": [
                                        {"key": k, "value": v}
                                        for k, v in run["metrics"].items()
                                    ]
                                },
                            }
                        )
                self._reply({"runs": out})
            else:
                self._reply({})

        do_GET = do_POST

    srv = HTTPServer(("127.0.0.1", 0), Stub)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    uri = f"http://127.0.0.1:{srv.server_port}"
    try:
        ancestry = commit_ancestry("/root/repo")
        parent = ancestry[1]  # a real ancestor commit of HEAD

        # machine A pushes baseline results for the parent commit
        store_a = RemoteBenchmarkStore(str(tmp_path / "a"), uri, repo="/root/repo")
        store_a.push({"grid_points_per_s": 1000.0, "step_time_ms": 50.0}, commit=parent)
        assert len(state["runs"]) == 1

        # machine B (fresh local cache) sees them and compares against them
        store_b = RemoteBenchmarkStore(str(tmp_path / "b"), uri, repo="/root/repo")
        fetched = store_b.get(parent)
        assert fetched == {"grid_points_per_s": 1000.0, "step_time_ms": 50.0}
        # fetched results are mirrored locally (offline cache)
        assert (tmp_path / "b" / f"{parent}.json").exists()

        # pushing again for the same commit reuses the run (no duplicates)
        store_a.push({"loss": 1.5}, commit=parent)
        assert len(state["runs"]) == 1

        cmp = store_b.compare({"grid_points_per_s": 1100.0})
        assert cmp["grid_points_per_s"]["baseline_commit"] == parent
        assert cmp["grid_points_per_s"]["ratio"] == pytest.approx(1.1)
    finally:
        srv.shutdown()


def test_open_benchmark_store_fallback(tmp_path, monkeypatch):
    from anemoi_tpu.training.benchmark_store import (
        BenchmarkStore,
        open_benchmark_store,
    )

    monkeypatch.delenv("ANEMOI_TPU_BENCHMARK_URI", raising=False)
    store = open_benchmark_store(str(tmp_path / "s"), repo="/root/repo")
    assert type(store) is BenchmarkStore
    # unreachable remote degrades to local with a warning
    monkeypatch.setenv("ANEMOI_TPU_BENCHMARK_URI", "http://127.0.0.1:1")
    store = open_benchmark_store(str(tmp_path / "s"), repo="/root/repo")
    assert type(store) is BenchmarkStore

import numpy as np

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


def test_compare_without_baseline(tmp_path):
    store = BenchmarkStore(str(tmp_path / "bench"), repo="/root/repo")
    cmp = store.compare({"x": 1.0})
    assert cmp["x"]["baseline"] is None

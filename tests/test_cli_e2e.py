"""CLI-level end-to-end: train -> checkpoint inspect -> evaluate -> predict
through the real `anemoi-tpu-training` entry point (argument plumbing,
packaged-preset composition, schema validation, checkpoint IO), mirroring the
reference's command tests (training/tests/unit/commands)."""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def cli_run(tmp_path_factory):
    import yaml

    from anemoi_tpu.training.cli import main

    tmp = tmp_path_factory.mktemp("cli")
    cfg_path = tmp / "exp.yaml"
    # compose the packaged example preset, shrunk to test scale
    with open(cfg_path, "w") as f:
        yaml.safe_dump(
            {
                "defaults": [
                    {"model": "graphtransformer"},
                    {"graph": "multi_scale"},
                    {"training": "default"},
                    {"diagnostics": "default"},
                    {"dataloader": "default"},
                    {"data": "synthetic"},
                    "_self_",
                ],
                "output_dir": str(tmp / "run"),
                "graph": {"save_path": str(tmp / "g.npz")},
            },
            f,
        )
    overrides = [
        "data.datasets.data.nodes.grid=o8",
        "data.datasets.data.num_times=16",
        "graph.recipe.nodes.data.node_builder.grid=o8",
        "graph.recipe.nodes.hidden.node_builder.resolution=1",
        "model.num_channels=16",
        "model.processor.num_layers=1",
        "training.max_epochs=1",
        "training.max_steps=3",
        "training.lr.warmup=1",
        "training.lr.iterations=5",
        "diagnostics.callbacks=[]",
        "diagnostics.log_interval=1",
    ]
    rc = main(["train", str(cfg_path)] + overrides)
    return rc, tmp, cfg_path, overrides


def test_cli_train(cli_run):
    rc, tmp, _, _ = cli_run
    assert rc == 0
    assert (tmp / "run" / "metrics.jsonl").exists()
    assert (tmp / "run" / "inference" / "checkpoint.json").exists()


def test_cli_checkpoint_inspect(cli_run, capsys):
    from anemoi_tpu.training.cli import main

    _, tmp, _, _ = cli_run
    rc = main(["checkpoint", "inspect", str(tmp / "run" / "inference")])
    assert rc == 0
    info = json.loads(capsys.readouterr().out)
    assert info["model"] == "AnemoiModelEncProcDec"
    assert info["migrations_pending"] == []


def test_cli_evaluate(cli_run):
    from anemoi_tpu.training.cli import main

    rc0, tmp, cfg_path, overrides = cli_run
    rc = main(["evaluate", str(cfg_path)] + overrides)
    assert rc == 0
    # evaluation appended val metrics to the run's metrics log
    lines = [
        json.loads(ln)
        for ln in open(tmp / "run" / "metrics.jsonl")
        if "val_loss" in ln
    ]
    assert lines and np.isfinite(lines[-1]["val_loss"])


def test_cli_predict(cli_run):
    from anemoi_tpu.training.cli import main

    _, tmp, cfg_path, overrides = cli_run
    out = tmp / "forecast.npz"
    # no --config: the inference bundle is self-contained (its recorded data
    # config provides the initial conditions)
    rc = main(
        ["predict", str(tmp / "run" / "inference"),
         "--steps", "2", "--output", str(out)]
    )
    assert rc == 0
    fc = np.load(out)
    fields = [fc[k] for k in fc.files if k.endswith("|forecast")]
    assert fields and all(np.isfinite(a).all() for a in fields)
    names = [fc[k] for k in fc.files if k.endswith("|variables")]
    assert names and len(names[0]) == fields[0].shape[-1]


def test_cli_config_generate(cli_run, tmp_path, capsys):
    from anemoi_tpu.training.cli import main

    _, _, cfg_path, overrides = cli_run
    rc = main(["config", "generate", str(cfg_path)] + overrides)
    assert rc == 0
    dumped = capsys.readouterr().out
    assert "AnemoiModelEncProcDec" in dumped or "num_channels" in dumped


def test_cli_profile_pushes_to_benchmark_store(cli_run, capsys):
    """`profile --benchmark-store` pushes commit-keyed results and compares
    against the latest stored ancestor (ref benchmark_server.py:194-216) --
    the regression-tracking discipline running in CI."""
    from anemoi_tpu.training.benchmark_store import BenchmarkStore
    from anemoi_tpu.training.cli import main

    import subprocess

    _, tmp, cfg_path, overrides = cli_run
    store_dir = str(tmp / "bench_store")
    # seed the PARENT commit so HEAD has an ancestor with stored results
    parent = subprocess.run(
        ["git", "rev-parse", "HEAD^"], capture_output=True, text=True
    ).stdout.strip()
    BenchmarkStore(store_dir).push({"avg_time_per_batch_s": 0.5}, commit=parent)

    rc = main(
        ["profile", str(cfg_path)] + overrides
        + ["--steps", "2", "--benchmark-store", store_dir,
           "--output-dir", str(tmp / "prof")]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "benchmark store: commit=" in out
    store = BenchmarkStore(store_dir)
    cmp = store.compare({"avg_time_per_batch_s": 1.0})
    assert cmp["avg_time_per_batch_s"]["baseline"] == 0.5
    assert cmp["avg_time_per_batch_s"]["ratio"] == 2.0
    assert cmp["avg_time_per_batch_s"]["baseline_commit"] == parent

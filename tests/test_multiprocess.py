"""Multi-host execution tests: real multi-process jax.distributed on CPU.

The TPU-native equivalent of the reference's gloo-based multi-process harness
(/root/reference/models/tests/distributed/distributed_runner.py:35-105): spawn
N OS processes, each with K virtual CPU devices, a local coordinator, and the
gloo cross-process collectives — then drive the FULL trainer (per-host data
loading + make_array_from_process_local_data batch assembly + sharded train
step) and check parity against the identical single-process run.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent(
    """
    import json, os, sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    from anemoi_tpu.training.cli import main

    outdir = sys.argv[1]
    cfg = sys.argv[2]
    rc = main(["train", cfg,
               f"output_dir={outdir}",
               "hardware.num_devices_per_model=2",
               "data.datasets.data.nodes.grid=o8",
               "data.datasets.data.num_times=16",
               "graph.recipe.nodes.data.node_builder.grid=o8",
               "graph.recipe.nodes.hidden.node_builder.resolution=1",
               "model.num_channels=16",
               "model.processor.num_layers=1",
               "training.max_epochs=1",
               "training.max_steps=2",
               "training.lr.warmup=1",
               "training.lr.iterations=5",
               "training.precompile_rollouts=false",
               "dataloader.batch_size=1",
               "diagnostics.callbacks=[]",
               "diagnostics.log_interval=1"])
    pid = jax.process_index()
    info = {"rc": rc, "process": pid, "nproc": jax.process_count(),
            "local_devices": jax.local_device_count(),
            "global_devices": jax.device_count()}
    with open(os.path.join(outdir, f"worker_{pid}.json"), "w") as f:
        json.dump(info, f)
    """
)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _write_config(tmp, outdir) -> str:
    import yaml

    cfg_path = os.path.join(tmp, "exp.yaml")
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
                "output_dir": outdir,
                "graph": {"save_path": os.path.join(tmp, "g.npz")},
            },
            f,
        )
    return cfg_path


def _spawn_workers(tmp, cfg_path, num_processes=2, devices_per_proc=2, timeout=900):
    port = _free_port()
    worker_py = os.path.join(tmp, "worker.py")
    with open(worker_py, "w") as f:
        f.write(WORKER)
    procs = []
    for pid in range(num_processes):
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={devices_per_proc}"
        env["ANEMOI_TPU_COORDINATOR"] = f"127.0.0.1:{port}"
        env["ANEMOI_TPU_NUM_PROCESSES"] = str(num_processes)
        env["ANEMOI_TPU_PROCESS_ID"] = str(pid)
        outdir = os.path.join(tmp, f"mp_run_p{pid}")
        procs.append(
            (
                subprocess.Popen(
                    [sys.executable, worker_py, outdir, cfg_path],
                    env=env, cwd=REPO,
                    stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
                ),
                outdir,
            )
        )
    outputs = []
    for p, outdir in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            pytest.fail(f"multi-process worker timed out:\n{out[-4000:]}")
        outputs.append((p.returncode, out, outdir))
    return outputs


@pytest.mark.slow
def test_multiprocess_trainer_parity(tmp_path):
    """2 processes x 2 virtual devices: the full trainer (per-host data
    loading, global batch assembly, sharded train step over a (data=2,
    model=2) mesh spanning both processes) produces the same losses as the
    identical single-process 4-device run."""
    tmp = str(tmp_path)
    cfg_path = _write_config(tmp, os.path.join(tmp, "mp_run"))

    outputs = _spawn_workers(tmp, cfg_path, num_processes=2, devices_per_proc=2)
    for rc, out, outdir in outputs:
        # the axon plugin aborts at interpreter exit on this image; judge by
        # the worker_?.json marker, not the return code
        files = [f for f in os.listdir(outdir)] if os.path.isdir(outdir) else []
        assert any(f.startswith("worker_") for f in files), (
            f"worker produced no completion marker (rc={rc}):\n{out[-4000:]}"
        )

    # worker 0 wrote the metrics; check the topology was really multi-process
    p0_dir = outputs[0][2]
    with open(os.path.join(p0_dir, "worker_0.json")) as f:
        info = json.load(f)
    assert info["rc"] == 0
    assert info["nproc"] == 2
    assert info["local_devices"] == 2 and info["global_devices"] == 4

    # process 1 wrote no metrics (process-0 gating; the file may exist empty)
    p1_metrics = os.path.join(outputs[1][2], "metrics.jsonl")
    assert not os.path.exists(p1_metrics) or os.path.getsize(p1_metrics) == 0

    mp_losses = [
        json.loads(line)["loss"]
        for line in open(os.path.join(p0_dir, "metrics.jsonl"))
        if "loss" in json.loads(line)
    ]
    assert len(mp_losses) == 2 and all(np.isfinite(v) for v in mp_losses)

    # single-process reference: same config on a 4-device mesh in THIS
    # process (conftest gives 8 virtual devices; the mesh uses the first 4)
    from anemoi_tpu.training.cli import main

    sp_out = os.path.join(tmp, "sp_run")
    rc = main(["train", cfg_path,
               f"output_dir={sp_out}",
               "hardware.num_devices=4",
               "hardware.num_devices_per_model=2",
               "data.datasets.data.nodes.grid=o8",
               "data.datasets.data.num_times=16",
               "graph.recipe.nodes.data.node_builder.grid=o8",
               "graph.recipe.nodes.hidden.node_builder.resolution=1",
               "model.num_channels=16",
               "model.processor.num_layers=1",
               "training.max_epochs=1",
               "training.max_steps=2",
               "training.lr.warmup=1",
               "training.lr.iterations=5",
               "training.precompile_rollouts=false",
               "dataloader.batch_size=1",
               "diagnostics.callbacks=[]",
               "diagnostics.log_interval=1"])
    assert rc == 0
    sp_losses = [
        json.loads(line)["loss"]
        for line in open(os.path.join(sp_out, "metrics.jsonl"))
        if "loss" in json.loads(line)
    ]
    np.testing.assert_allclose(mp_losses, sp_losses, rtol=2e-4, atol=1e-5)


def test_host_local_slices_4d():
    """host_local_slices extracts this process's contiguous block per dim
    (single-process: everything)."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from anemoi_tpu.parallel.distributed import host_local_slices, local_batch_plan

    devs = np.asarray(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("data", "model"))
    sharding = NamedSharding(mesh, P("data", None, None, "model", None))
    shape = (4, 3, 1, 10, 5)
    slc = host_local_slices(sharding, shape)
    assert slc == (slice(0, 4), slice(0, 3), slice(0, 1), slice(0, 10), slice(0, 5))
    plan = local_batch_plan(sharding, {"data": shape})
    assert plan["data"][0] == slice(0, 4)


def test_make_global_array_single_process():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from anemoi_tpu.parallel.distributed import make_global_array

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("data",))
    sharding = NamedSharding(mesh, P("data"))
    local = np.arange(8, dtype=np.float32).reshape(8, 1)
    arr = make_global_array(local, sharding, (8, 1))
    assert arr.shape == (8, 1)
    np.testing.assert_array_equal(np.asarray(arr), local)

"""Capture a jax.profiler trace of the flagship training step and print a
per-op time breakdown parsed straight from the xplane protobuf.

Usage:  python tools/profile_step.py [trace_dir]
Env: the same BENCH_* overrides as bench.py.

The tensorboard_plugin_profile converter is broken in this image (pybind
mismatch), so we parse the XSpace proto directly: find the TPU device plane,
aggregate event self-durations per HLO op, and group by fusion-name heuristics.
"""

from __future__ import annotations

import glob
import os
import re
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def capture(trace_dir: str) -> None:
    import jax
    import numpy as np

    from __graft_entry__ import _build_interface
    from anemoi_tpu.training.losses import get_loss_function
    from anemoi_tpu.training.losses.scalers import create_scalers
    from anemoi_tpu.training.optimizers import build_optimizer
    from anemoi_tpu.training.step import TrainState, make_step_fns

    grid = os.environ.get("BENCH_GRID", "o96")
    mesh_level = int(os.environ.get("BENCH_MESH_LEVEL", "5"))
    channels = int(os.environ.get("BENCH_CHANNELS", "512"))
    layers = int(os.environ.get("BENCH_LAYERS", "16"))
    heads = int(os.environ.get("BENCH_HEADS", "16"))

    # same env contract as bench.py: paged is the flagship path, and
    # BENCH_REMAT/BENCH_REMAT_POLICY pick the per-layer remat mode (a profile
    # that silently drops these measures a different program than the bench)
    backend = os.environ.get("BENCH_BACKEND", "paged")
    iface, graph = _build_interface(
        grid=grid, mesh_resolution=mesh_level, num_channels=channels,
        num_layers=layers, num_heads=heads, attention_backend=backend,
        remat_layers=os.environ.get("BENCH_REMAT", "0") == "1",
        remat_policy=os.environ.get("BENCH_REMAT_POLICY", "save_attention"),
    )
    idx = iface.data_indices["data"]
    n_grid = graph["data"].num_nodes
    scalers = create_scalers(
        {"area": {"name": "GraphNodeAttributeScaler", "nodes_name": "data",
                  "attribute_name": "area_weight"}},
        graph=graph, data_indices=idx,
    )
    losses = {"data": get_loss_function(
        {"name": "WeightedMSELoss", "scalers": ["area"]}, scalers)}
    tx = build_optimizer({"lr": {"rate": 1e-4, "warmup": 10, "iterations": 1000}})
    params = iface.init_params()
    state = TrainState.create(params, tx)
    train_step, _ = make_step_fns(
        iface, losses, rollout=1, remat_rollout=True,
        precision=os.environ.get("BENCH_DTYPE", "bf16"),
    )
    rng = np.random.default_rng(0)
    batch = {"data": jax.device_put(rng.normal(
        size=(1, iface.model.n_step_input + 1, 1, n_grid, idx.num_data_vars)
    ).astype(np.float32))}

    if os.environ.get("PROFILE_INFERENCE", "0") == "1":
        # serving path: jitted interface.predict_step, tables as jit ARGUMENTS
        # (repo invariant: closed-over tables inline as HLO constants and
        # compile ~13x slower on axon)
        predict = jax.jit(iface.predict_step)
        infer_gi = iface.inference_graph_inputs
        x_in = {"data": batch["data"][:, : iface.model.n_step_input]}
        out = predict(state.params, x_in, infer_gi)
        jax.block_until_ready(out["data"])
        t0 = time.time()
        for _ in range(3):
            out = predict(state.params, x_in, infer_gi)
        jax.block_until_ready(out["data"])
        print(f"inference step {(time.time()-t0)/3*1000:.1f} ms", file=sys.stderr)
        with jax.profiler.trace(trace_dir):
            for _ in range(3):
                out = predict(state.params, x_in, infer_gi)
            jax.block_until_ready(out["data"])
        return

    # warm up (compile)
    state, metrics = train_step(state, batch)
    jax.block_until_ready(metrics["loss"])
    t0 = time.time()
    for _ in range(3):
        state, metrics = train_step(state, batch)
    jax.block_until_ready(metrics["loss"])
    print(f"step time {(time.time()-t0)/3*1000:.1f} ms", file=sys.stderr)

    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            state, metrics = train_step(state, batch)
        jax.block_until_ready(metrics["loss"])


GROUPS = [
    ("gather", re.compile(r"gather|dynamic-slice", re.I)),
    ("convolution/dot", re.compile(r"convolution|dot|matmul", re.I)),
    ("all-reduce/collective", re.compile(r"all-reduce|all-gather|collective", re.I)),
    ("copy/transpose", re.compile(r"copy|transpose|bitcast", re.I)),
    ("reduce", re.compile(r"reduce", re.I)),
]


def classify(name: str) -> str:
    for label, pat in GROUPS:
        if pat.search(name):
            return label
    return "other"


def report(trace_dir: str, top: int = 40) -> None:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    assert paths, f"no xplane.pb under {trace_dir}"
    path = max(paths, key=os.path.getmtime)
    xspace = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xspace.ParseFromString(f.read())

    for plane in xspace.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
        per_op = defaultdict(float)
        total = 0.0
        print(f"\n== plane: {plane.name} lines: {[l.name for l in plane.lines]}")
        for line in plane.lines:
            # only the leaf per-op line -- module/while lines nest and would
            # double-count
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                dur = ev.duration_ps / 1e9  # ms
                per_op[meta.get(ev.metadata_id, "?")] += dur
                total += dur
        if not per_op:
            continue
        print(f"\n== plane: {plane.name}  (total op-time {total:.1f} ms over trace)")
        by_group = defaultdict(float)
        for name, ms in per_op.items():
            by_group[classify(name)] += ms
        for g, ms in sorted(by_group.items(), key=lambda kv: -kv[1]):
            print(f"  {g:24s} {ms:9.2f} ms  {100*ms/total:5.1f}%")
        print(f"\n  top {top} ops:")
        for name, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[:top]:
            print(f"  {ms:9.2f} ms  {100*ms/total:5.1f}%  {name[:110]}")
        grp = os.environ.get("PROFILE_GROUP")
        if grp:
            print(f"\n  top {top} ops in group '{grp}':")
            sel = [(n, ms) for n, ms in per_op.items() if classify(n) == grp]
            for name, ms in sorted(sel, key=lambda kv: -kv[1])[:top]:
                print(f"  {ms:9.2f} ms  {100*ms/total:5.1f}%  {name[:130]}")


if __name__ == "__main__":
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/anemoi_trace"
    if not glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True):
        capture(trace_dir)
    report(trace_dir)

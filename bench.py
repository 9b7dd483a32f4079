"""Benchmark: one full training step (fwd+bwd+optimizer) of the flagship
GraphTransformer EncProcDec at the reference benchmark scale
(num_channels=512, 16 layers, 16 heads, batch 1 -- mirrors
/root/reference/training/tests/integration/config/benchmark/*.yaml), on an
O96 reduced-Gaussian grid -> level-5 icosahedral mesh.

Prints ONE json line: grid-points/s/chip on the available accelerator.
Env overrides: BENCH_GRID, BENCH_MESH_LEVEL, BENCH_CHANNELS, BENCH_LAYERS,
BENCH_HEADS, BENCH_STEPS, BENCH_ROLLOUT, BENCH_DTYPE.
"""

from __future__ import annotations

import json
import os
import sys
import time


def log(msg):
    print(msg, file=sys.stderr, flush=True)

import numpy as np


def _parse_block(v):
    return tuple(int(x) for x in v.split(",")) if v else None


def _parse_flag(name):
    """Tri-state env flag: unset -> None (inherit/auto), "1" -> True,
    anything else -> False (so =0 really disables the auto heuristic)."""
    v = os.environ.get(name)
    return None if v is None else v == "1"


def main() -> None:
    # persistent compile cache: the axon/TPU toolchain compiles large graphs
    # slowly; cache across bench runs (harmless elsewhere)
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_tpu_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

    import jax
    import jax.numpy as jnp

    # multi-host: env-triggered jax.distributed wiring (no-op single process)
    from anemoi_tpu.parallel.distributed import maybe_initialize

    maybe_initialize()

    grid = os.environ.get("BENCH_GRID", "o96")
    mesh_level = int(os.environ.get("BENCH_MESH_LEVEL", "5"))
    channels = int(os.environ.get("BENCH_CHANNELS", "512"))
    layers = int(os.environ.get("BENCH_LAYERS", "16"))
    heads = int(os.environ.get("BENCH_HEADS", "16"))
    steps = int(os.environ.get("BENCH_STEPS", "10"))
    rollout = int(os.environ.get("BENCH_ROLLOUT", "1"))
    # the fused paged Pallas kernel is the flagship path (13.1x anchor);
    # BENCH_BACKEND=padded measures the XLA gather path
    model_kind = os.environ.get("BENCH_MODEL", "encprocdec")
    # the GNN conv family gathers through the padded-CSR tables (no paged
    # kernel on the conv path) -- exact-k tables beat SFC paging there
    default_backend = "padded" if model_kind == "gnn" else "paged"
    backend = os.environ.get("BENCH_BACKEND", default_backend)
    # per-layer remat with the save_attention policy is FASTER than the full
    # scan-residual stash at the flagship scale (157.8 vs 161.6 ms, round 4:
    # the backward replays matmuls/norms but the [16, N, 4C] MLP stash never
    # exists) -- on by default there; other shapes keep explicit control
    flagship_shape = (grid, mesh_level, channels, layers, backend, rollout,
                      model_kind) == ("o96", 5, 512, 16, "paged", 1,
                                      "encprocdec")
    remat_default = "1" if flagship_shape else "0"

    from __graft_entry__ import _build_interface
    from anemoi_tpu.training.losses import get_loss_function
    from anemoi_tpu.training.losses.scalers import create_scalers
    from anemoi_tpu.training.optimizers import build_optimizer
    from anemoi_tpu.training.step import TrainState, make_step_fns

    log(f"building graph {grid} -> ico{mesh_level} ...")
    t0 = time.time()
    iface, graph = _build_interface(
        grid=grid,
        mesh_resolution=mesh_level,
        num_channels=channels,
        num_layers=layers,
        num_heads=heads,
        attention_backend=backend,
        # per-layer remat: required above o96 scale (o160/ico-6 OOMs without
        # it) and faster than the full scan stash AT flagship scale
        remat_layers=os.environ.get("BENCH_REMAT", remat_default) == "1",
        # BENCH_REMAT_MAPPERS=1: remat the mapper blocks too (drops the big
        # [num_flat, HD] edge-slot residuals from HBM at n320-class grids)
        remat_mappers=os.environ.get("BENCH_REMAT_MAPPERS", "0") == "1",
        # BENCH_REMAT_POLICY: full | save_attention | dots (processor.py);
        # save_attention (default) keeps the kernel out/lse so the backward
        # never re-runs the forward Pallas kernel (o160 896->680 ms)
        remat_policy=os.environ.get("BENCH_REMAT_POLICY", "save_attention"),
        # "bd,page,r" triples for the paged kernel tables (docs/design.md §6)
        paged_block=_parse_block(os.environ.get("BENCH_PAGED_BLOCK")),
        paged_mapper_block=_parse_block(os.environ.get("BENCH_PAGED_MAPPER_BLOCK")),
        # fused backward (recompute-and-reduce kv grads; no [num_flat, 2HD]
        # dkv transient) -- a memory lever for n320-class mapper edge sets
        paged_fused_bwd=_parse_flag("BENCH_PAGED_FUSED"),
        paged_mapper_fused_bwd=_parse_flag("BENCH_PAGED_MAPPER_FUSED"),
        # BENCH_MODEL=hierarchical: two-level V-cycle (BENCH_LAYERS = layers
        # PER level processor; the preset default is 2)
        model=model_kind,
    )
    build_s = time.time() - t0
    log(f"graph+iface built in {build_s:.1f}s")

    idx = iface.data_indices["data"]
    n_grid = graph["data"].num_nodes
    n_vars = idx.num_data_vars
    window = iface.model.n_step_input + rollout

    scalers = create_scalers(
        {
            "area": {
                "name": "GraphNodeAttributeScaler",
                "nodes_name": "data",
                "attribute_name": "area_weight",
            }
        },
        graph=graph,
        data_indices=idx,
    )
    ens = int(os.environ.get("BENCH_ENSEMBLE", "1"))
    loss_name = "WeightedMSELoss" if ens <= 1 else "KernelCRPS"
    losses = {"data": get_loss_function({"name": loss_name, "scalers": ["area"]}, scalers)}
    tx = build_optimizer(
        {"lr": {"rate": 1e-4, "warmup": 10, "iterations": 1000},
         "gradient_clip": {"val": 32.0, "algorithm": "value"}}
    )

    log("initialising params (jit) ...")
    t0 = time.time()
    params = iface.init_params()
    state = TrainState.create(params, tx)
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    init_s = time.time() - t0
    log(f"init in {init_s:.1f}s")

    precision = os.environ.get("BENCH_DTYPE", "bf16")
    if model_kind == "transport":
        # EDM-diffusion tendency training step (ref benchmark flavour
        # edm_diffusion_tendency, training/config/transport_*.yaml)
        import jax as _jax

        from anemoi_tpu.training.transport_step import make_transport_step_fns

        train_step, _ = make_transport_step_fns(
            iface, losses, objective="edm", tendency=True,
            base_rng=_jax.random.PRNGKey(0), precision=precision,
        )
    else:
        train_step, _ = make_step_fns(
            iface, losses, rollout=rollout, remat_rollout=True, precision=precision,
            remat_policy=os.environ.get("BENCH_REMAT_POLICY", "save_attention"),
            fp32_head=os.environ.get("BENCH_FP32_HEAD", "0") == "1",
            # BENCH_ENSEMBLE=k: k-member CRPS training step (EnsembleTraining)
            ensemble_size=int(os.environ.get("BENCH_ENSEMBLE", "1")),
            # BENCH_DONATE=1: donate the train state (aliasing experiment; see
            # the measured-neutral note in step.py)
            donate_state=os.environ.get("BENCH_DONATE", "0") == "1",
            # BENCH_GRAD_NORM=0: drop the per-step grad-norm metric (an
            # extra full pass over every gradient leaf)
            with_grad_norm=os.environ.get("BENCH_GRAD_NORM", "1") == "1",
        )

    rng = np.random.default_rng(0)
    batch = {
        "data": jax.device_put(
            rng.normal(size=(1, window, 1, n_grid, n_vars)).astype(np.float32)
        )
    }

    log("compiling train step ...")
    t0 = time.time()
    # AOT lower+compile so the SAME executable yields XLA's cost analysis
    # (flops / bytes accessed) for MFU + HBM-roofline reporting
    cost = None
    hlo_mb = None
    try:
        compiled = train_step.jitted.lower(
            state, batch, *train_step.bound_args
        ).compile()

        def run_step(s, b):
            return compiled(s, b, *train_step.bound_args)

        try:
            c = compiled.cost_analysis()
            cost = c[0] if isinstance(c, (list, tuple)) else c
        except Exception as e:
            log(f"cost_analysis unavailable: {e}")
        try:
            # program size: the service-noise-immune compile-time signal
            # (docs/benchmarking.md: real compile regressions show up as
            # program growth first, e.g. the 13x closed-over-constants
            # incident)
            hlo_mb = len(compiled.as_text()) / 1e6
            log(f"optimized HLO {hlo_mb:.1f} MB")
        except Exception:
            hlo_mb = None
    except Exception as e:
        log(f"AOT compile unavailable ({e}); jit path")
        run_step = train_step
    state, metrics = run_step(state, batch)
    jax.block_until_ready(metrics["loss"])
    compile_s = time.time() - t0
    log(f"train step compiled in {compile_s:.1f}s")

    t0 = time.time()
    for _ in range(steps):
        state, metrics = run_step(state, batch)
    jax.block_until_ready(metrics["loss"])
    step_time = (time.time() - t0) / steps

    # inference (forward-only predict) timing: the serving path
    infer_ms = None
    try:
        if model_kind == "transport":
            # transport serving = generative sampling: one EDM-Heun
            # 20-step sample per forecast step (the reference's sampler
            # path, transport/objectives.py sample)
            from anemoi_tpu.training.step import _index_arrays
            from anemoi_tpu.training.transport_step import make_sampler

            n_samp = int(os.environ.get("BENCH_SAMPLING_STEPS", "20"))
            generate = make_sampler(
                iface, objective="edm", sampler="edm_heun", num_steps=n_samp
            )
            ia = _index_arrays(idx)
            x_in = {
                "data": batch["data"][:, : iface.model.n_step_input][
                    ..., jnp.asarray(ia["data_input_full"])
                ]
            }
            key = jax.random.PRNGKey(0)
            out = generate(state.params, x_in, key)
            jax.block_until_ready(out["data"])
            t0 = time.time()
            for i in range(max(steps // 2, 1)):
                out = generate(state.params, x_in, jax.random.fold_in(key, i))
            jax.block_until_ready(out["data"])
            infer_ms = (time.time() - t0) / max(steps // 2, 1) * 1000
            log(f"sampling ({n_samp}-step EDM Heun): {infer_ms:.1f} ms")
        else:
            # inference tables as a jit ARGUMENT (repo invariant: constants
            # inflate axon compiles ~13x)
            predict = jax.jit(iface.predict_step)
            infer_gi = iface.inference_graph_inputs
            x_in = {"data": batch["data"][:, : iface.model.n_step_input]}
            out = predict(state.params, x_in, infer_gi)
            jax.block_until_ready(out["data"])
            t0 = time.time()
            for _ in range(steps):
                out = predict(state.params, x_in, infer_gi)
            jax.block_until_ready(out["data"])
            infer_ms = (time.time() - t0) / steps * 1000
            log(f"inference step: {infer_ms:.1f} ms")
    except Exception as e:  # never fail the bench on the extra metric
        log(f"inference timing skipped: {e}")

    gps = n_grid * rollout / step_time  # grid-points advanced per second per chip

    # --- MFU + HBM roofline (VERDICT r2 item 3) ------------------------
    # achieved FLOP/s and HBM traffic vs chip peaks.  XLA's cost_analysis
    # counts a scan/while BODY ONCE (not x trip count), so on this nn.scan'd
    # 16-layer processor it understates the step ~3x; MFU therefore uses the
    # larger of the analytic model (utils/costs.py) and XLA's count, and the
    # XLA-derived HBM figure is a LOWER BOUND.
    from anemoi_tpu.utils.costs import chip_peaks, estimate_train_step_flops

    flops_analytic = estimate_train_step_flops(
        graph, channels, layers, rollout=rollout, ensemble=ens,
        kind=model_kind if model_kind in ("transformer", "gnn") else "gt",
        window=int(os.environ.get("BENCH_WINDOW", "512")),
    )
    flops_xla = float(cost.get("flops", 0.0)) if cost else 0.0
    bytes_xla = float(cost.get("bytes accessed", 0.0)) if cost else 0.0
    peaks = chip_peaks(jax.devices()[0].device_kind)
    mfu = hbm_util = None
    flops_best = max(flops_xla, flops_analytic)
    if peaks and flops_best:
        peak_f, peak_b = peaks
        mfu = flops_best / step_time / peak_f
        if bytes_xla:
            hbm_util = bytes_xla / step_time / peak_b
        log(
            f"mfu {mfu * 100:.1f}% ({flops_best / 1e12:.2f} TFLOP/step, "
            f"xla={flops_xla / 1e12:.2f} analytic={flops_analytic / 1e12:.2f}; "
            f"peak {peak_f / 1e12:.0f} TFLOP/s)"
            + (
                f", hbm >={hbm_util * 100:.1f}% ({bytes_xla / 1e9:.1f} GB/step "
                f"XLA lower bound, peak {peak_b / 1e9:.0f} GB/s)"
                if hbm_util is not None
                else ""
            )
        )

    baseline = 15007.6  # round-1 anchor (BENCH_BASELINE.json); ref publishes no absolute numbers
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_BASELINE.json")) as f:
            baseline = float(json.load(f)["value"])
    except Exception:
        pass
    result = {
        "metric": "train_grid_points_per_s_per_chip",
        "value": round(gps, 1),
        "unit": "gridpoints/s",
        "vs_baseline": round(gps / baseline, 3),
        "detail": {
            "grid": grid,
            "n_grid": n_grid,
            "mesh_level": mesh_level,
            "channels": channels,
            "layers": layers,
            "heads": heads,
            "rollout": rollout,
            "precision": precision,
            "backend": backend,
            "step_time_ms": round(step_time * 1000, 2),
            "params_m": round(n_params / 1e6, 2),
            "compile_s": round(compile_s, 1),
            "build_s": round(build_s, 1),
            "init_s": round(init_s, 1),
            "device": str(jax.devices()[0]),
            "infer_ms": None if infer_ms is None else round(infer_ms, 2),
            "loss": float(metrics["loss"]),
            "mfu": None if mfu is None else round(mfu, 4),
            "hbm_util": None if hbm_util is None else round(hbm_util, 4),
            "tflops_per_step_xla": round(flops_xla / 1e12, 3) if flops_xla else None,
            "tflops_per_step_analytic": round(flops_analytic / 1e12, 3),
            "hbm_gb_per_step": round(bytes_xla / 1e9, 2) if bytes_xla else None,
            "hlo_mb": None if hlo_mb is None else round(hlo_mb, 2),
        },
    }

    # benchmark-regression discipline (ref diagnostics/benchmark_server.py:194):
    # push this run into the commit-keyed store and compare against the most
    # recent ancestor commit that also has a stored result
    try:
        from anemoi_tpu.training.benchmark_store import open_benchmark_store

        repo = os.path.dirname(os.path.abspath(__file__))
        # ANEMOI_TPU_BENCHMARK_URI=http://mlflow-host -> shared remote store
        store = open_benchmark_store(os.path.join(repo, ".bench_store"), repo=repo)
        metrics_flat = {
            "grid_points_per_s": gps,
            "step_time_ms": step_time * 1000,
            "compile_s": compile_s,
            "loss": float(metrics["loss"]),
        }
        if hlo_mb is not None:
            metrics_flat["hlo_mb"] = hlo_mb
        if mfu is not None:
            metrics_flat["mfu"] = mfu
        if hbm_util is not None:
            metrics_flat["hbm_util"] = hbm_util
        # flagship-default revision marker: bump when the untagged flagship
        # series changes configuration (rev 2 = round-4 flip to per-layer
        # save_attention remat), so a compare whose config_rev ratio != 1
        # is flagged as a config change, not a code regression
        metrics_flat["config_rev"] = 2.0
        # non-flagship configs store under a config-tag prefix so the
        # ancestor comparison never mixes different benchmark configs
        flagship = (
            flagship_shape
            and jax.devices()[0].platform == "tpu"
            # non-default execution knobs must not overwrite the flagship
            # series (kernel-block sweeps, remat experiments)
            and not os.environ.get("BENCH_PAGED_BLOCK")
            and not os.environ.get("BENCH_PAGED_MAPPER_BLOCK")
            and os.environ.get("BENCH_REMAT", remat_default) == remat_default
            and os.environ.get("BENCH_REMAT_POLICY", "save_attention")
            == "save_attention"
            and os.environ.get("BENCH_SCAN", "1") == "1"
            and os.environ.get("BENCH_SCAN_UNROLL", "1") == "1"
            and os.environ.get("BENCH_GRAD_NORM", "1") == "1"
            and ens == 1
            and not os.environ.get("BENCH_PAGED_FUSED")
            and not os.environ.get("BENCH_PAGED_MAPPER_FUSED")
            and os.environ.get("BENCH_PAGED_MAPPERS", "1") == "1"
        )
        if not flagship:
            tag = f"{grid}-L{mesh_level}-{channels}ch-{layers}l-{backend}-r{rollout}"
            # non-GT families get their own series (hierarchical keeps the
            # historical untagged-model key for anchor continuity)
            if model_kind not in ("encprocdec", "hierarchical"):
                tag += f"-{model_kind}"
            if os.environ.get("BENCH_ATTN_IMPL", "pallas") != "pallas":
                tag += f"-attn.{os.environ['BENCH_ATTN_IMPL']}"
            if os.environ.get("BENCH_WINDOW", "512") != "512":
                tag += f"-w{os.environ['BENCH_WINDOW']}"
            if os.environ.get("BENCH_REMAT", remat_default) == "1":
                tag += "-remat." + os.environ.get(
                    "BENCH_REMAT_POLICY", "save_attention"
                )
            if ens > 1:
                tag += f"-ens{ens}"
            if os.environ.get("BENCH_SCAN", "1") != "1":
                tag += "-unrolled"
            if os.environ.get("BENCH_SCAN_UNROLL", "1") != "1":
                tag += f"-su{os.environ['BENCH_SCAN_UNROLL']}"
            if os.environ.get("BENCH_GRAD_NORM", "1") != "1":
                tag += "-nognorm"
            for var, label in (("BENCH_PAGED_FUSED", "fusedbwd"),
                               ("BENCH_PAGED_MAPPER_FUSED", "mfusedbwd")):
                if os.environ.get(var):
                    tag += f"-{label}.{os.environ[var]}"
            if os.environ.get("BENCH_PAGED_MAPPERS", "1") != "1":
                tag += "-paddedmappers"
            for var, label in (("BENCH_PAGED_BLOCK", "block"),
                               ("BENCH_PAGED_MAPPER_BLOCK", "mblock")):
                if os.environ.get(var):
                    tag += f"-{label}.{os.environ[var]}"
            metrics_flat = {f"{tag}/{k}": v for k, v in metrics_flat.items()}
        # per-key ancestor search: sweep-tagged commits in between no longer
        # null out the flagship comparison (round-4 regression)
        cmp = store.compare(metrics_flat)
        commit = store.push(metrics_flat)
        result["store"] = {"commit": commit, "compare": cmp}
    except Exception as e:  # never fail the bench on store trouble
        result["store"] = {"error": str(e)}

    print(json.dumps(result))


if __name__ == "__main__":
    main()

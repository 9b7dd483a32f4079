"""Inference: autoregressive forecasting from an inference checkpoint.

Equivalent of the anemoi-inference entry path over the reference's
`AnemoiModelInterface.predict_step` (models/interface/__init__.py:211,
models/models/base.py:303): given a raw data-space window containing the
initial conditions and future forcings, roll the model forward N steps and
return denormalised model-space forecasts.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from anemoi_tpu.training.step import _index_arrays, advance_input


def make_forecast_fn(interface, steps: int, aot_cache: str | None = None):
    """Jitted fn(params, batch) -> {ds: [B, steps*n_out, E, G, V_out]} physical.

    batch: raw data-space {ds: [B, m + steps*n_out, E, G, V_data]} -- the
    window beyond the first m steps supplies the future forcings (analysis
    forcings for hindcasts; climatological or computed forcings in production).

    ``aot_cache`` (or env ANEMOI_TPU_AOT_CACHE): directory for serialized
    COMPILED executables (utils/aot_cache.py) -- serving cold starts reload
    in ~0.1 s instead of paying the axon compile (minutes at flagship size).
    """
    import os as _os

    if aot_cache is None:
        aot_cache = _os.environ.get("ANEMOI_TPU_AOT_CACHE")
    model = interface.model
    pre = interface.pre_processors
    indices = interface.data_indices
    m = model.n_step_input
    n_out = model.n_step_output
    ia = {ds: _index_arrays(idx) for ds, idx in indices.items()}
    dataset_names = sorted(indices.keys())
    graph_inputs = interface.inference_graph_inputs

    dt = interface.inference_compute_dtype  # bf16 serving (fp32 pre/post)

    @jax.jit
    def _forecast(params, batch, graph_inputs):
        # tables enter as jit ARGUMENTS (constants compile ~13x slower)
        p = interface.cast_inference_params(params)
        batch_norm = {ds: pre[ds].transform(batch[ds]) for ds in dataset_names}
        x = {
            ds: batch_norm[ds][:, :m, ..., jnp.asarray(ia[ds]["data_input_full"])]
            for ds in dataset_names
        }
        if dt is not None:
            x = {ds: v.astype(dt) for ds, v in x.items()}
        outputs = {ds: [] for ds in dataset_names}
        uses_fcstep = bool(getattr(model, "fcstep_input", False))
        for step in range(steps):
            y_pred = model.apply(
                p, x, graph_inputs, **({"fcstep": step} if uses_fcstep else {})
            )
            t0 = m + step * n_out
            for ds in dataset_names:
                outputs[ds].append(
                    pre[ds].inverse_transform(y_pred[ds].astype(jnp.float32))
                )
            if step + 1 < steps:
                x = {
                    ds: advance_input(x[ds], y_pred[ds], batch_norm[ds], t0, ia[ds])
                    for ds in dataset_names
                }
        return {ds: jnp.concatenate(v, axis=1) for ds, v in outputs.items()}

    aot_state: dict = {}

    def forecast(params, batch):
        if aot_cache is None:
            return _forecast(params, batch, graph_inputs)
        if "fn" not in aot_state:
            from anemoi_tpu.utils.aot_cache import load_or_compile

            aot_state["fn"] = load_or_compile(
                _forecast, (params, batch, graph_inputs), aot_cache,
                context={"component": "forecast", "steps": steps,
                         "model": interface.config.get("model", {})},
            )
        return aot_state["fn"](params, batch, graph_inputs)

    return forecast


def make_transport_forecast_fn(
    interface,
    steps: int,
    objective: str = "edm",
    sampler: str = "edm_heun",
    num_steps: int = 20,
    tendency: bool = False,
):
    """Autoregressive GENERATIVE forecast from a transport (diffusion /
    stochastic-interpolant) checkpoint: per rollout step, sample the next
    state conditioned on the current window, advance, repeat (the serving
    path of the reference's transport models + transport_samplers.py).

    Returns fn(params, batch, key) -> physical {ds: [B, steps*n_out, ...]}.
    """
    from anemoi_tpu.training.transport_step import make_sampler

    model = interface.model
    pre = interface.pre_processors
    indices = interface.data_indices
    m = model.n_step_input
    n_out = model.n_step_output
    ia = {ds: _index_arrays(idx) for ds, idx in indices.items()}
    dataset_names = sorted(indices.keys())
    generate = make_sampler(
        interface, objective=objective, sampler=sampler, num_steps=num_steps
    )

    def forecast(params, batch, key):
        batch_norm = {ds: pre[ds].transform(batch[ds]) for ds in dataset_names}
        x = {
            ds: batch_norm[ds][:, :m, ..., jnp.asarray(ia[ds]["data_input_full"])]
            for ds in dataset_names
        }
        # tendency models sample increments on the LAST observed state
        prev = {
            ds: batch_norm[ds][
                :, m - 1 : m - 1 + n_out, ...,
                jnp.asarray(ia[ds]["model_out_in_data"]),
            ]
            for ds in dataset_names
        }
        outputs = {ds: [] for ds in dataset_names}
        for step in range(steps):
            y = generate(params, x, jax.random.fold_in(key, step))
            if tendency:
                y = {ds: prev[ds] + y[ds] for ds in dataset_names}
            prev = y
            t0 = m + step * n_out
            for ds in dataset_names:
                outputs[ds].append(pre[ds].inverse_transform(y[ds]))
            if step + 1 < steps:
                x = {
                    ds: advance_input(x[ds], y[ds], batch_norm[ds], t0, ia[ds])
                    for ds in dataset_names
                }
        return {ds: jnp.concatenate(v, axis=1) for ds, v in outputs.items()}

    return forecast


def run_forecast_cli(args) -> int:
    """`anemoi-tpu-training predict` implementation."""
    import os

    import anemoi_tpu
    from anemoi_tpu.data.dataset import open_dataset
    from anemoi_tpu.training.checkpoint import load_inference_checkpoint
    from anemoi_tpu.utils.config import load_config

    iface, params = load_inference_checkpoint(args.checkpoint)
    steps = args.steps
    model_name = str((iface.config or {}).get("model", {}).get("name", ""))
    is_transport = model_name.startswith("AnemoiTransport")
    if is_transport:
        tcfg = dict(
            (iface.config or {}).get("training", {}).get("transport", {}) or {}
        )
        forecast_t = make_transport_forecast_fn(
            iface,
            steps,
            objective=str(tcfg.get("objective", "edm")),
            sampler=str(tcfg.get("sampler", "edm_heun"
                                 if tcfg.get("objective", "edm") == "edm"
                                 else "vf_heun")),
            num_steps=int(tcfg.get("sampling_steps", 20)),
            tendency=bool(tcfg.get("tendency", False)),
        )
        key = jax.random.PRNGKey(int(getattr(args, "seed", 0) or 0))

        def forecast(params, batch):
            return forecast_t(params, batch, key)
    else:
        forecast = make_forecast_fn(
            iface, steps, aot_cache=getattr(args, "aot_cache", None)
        )

    packaged = os.path.join(os.path.dirname(anemoi_tpu.__file__), "config")
    cfg = load_config(args.config, search_paths=[packaged]) if args.config else None
    datasets = {}
    data_cfg = (cfg or {}).get("data", {})
    if not data_cfg.get("datasets"):
        # inference checkpoints are self-contained: fall back to the data
        # config recorded in the bundle (ref: pickled AnemoiModelInterface
        # carries its config, diagnostics/callbacks/checkpoint.py:161-211)
        data_cfg = (iface.config or {}).get("data", {})
    for name, ds_cfg in data_cfg.get("datasets", {}).items():
        datasets[name] = open_dataset(ds_cfg)
    assert datasets, (
        "predict needs data.datasets for initial conditions -- pass --config "
        "or use a checkpoint whose bundled config defines them"
    )

    m = iface.model.n_step_input
    n_out = iface.model.n_step_output
    window = m + steps * n_out
    start = args.start_index
    batch = {
        name: ds.get_window(start, window)[None]  # [1, T, E, G, V]
        for name, ds in datasets.items()
    }
    out = forecast(params, jax.device_put(batch))
    arrays = {}
    for ds_name, arr in out.items():
        arrays[f"{ds_name}|forecast"] = np.asarray(arr)
        arrays[f"{ds_name}|variables"] = np.asarray(
            iface.data_indices[ds_name].model.output.ordered_names
        )
    np.savez_compressed(args.output, **arrays)
    shapes = {k: v.shape for k, v in out.items()}
    print(f"forecast written to {args.output}: {shapes}")
    return 0

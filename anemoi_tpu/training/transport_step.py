"""Transport (diffusion / interpolant) training and sampling steps.

Equivalents of the reference's transport training method and sampling path
(/root/reference/training/src/anemoi/training/train/methods/transport.py:309-500,
methods/edm_diffusion.py:25, models/samplers/): one jitted EDM training step
(draw sigma -> noise target -> denoiser loss) and a scan-based sampler for
generation, both conditioned on the input window.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from anemoi_tpu.models.transport.objectives import (
    EDMConfig,
    edm_denoise,
    edm_preconditioning,
    edm_training_targets,
    interpolant_training_targets,
)
from anemoi_tpu.models.transport.samplers import SAMPLERS
from anemoi_tpu.models.transport.schedules import SIGMA_SCHEDULES, unit_time_schedule
from anemoi_tpu.training.step import TrainState, _index_arrays
from anemoi_tpu.utils.seeding import context_key


def make_transport_step_fns(
    interface,
    losses: Dict[str, Callable],
    objective: str = "edm",
    edm: EDMConfig = EDMConfig(),
    tendency: bool = False,
    interpolant_gamma: float = 0.0,
    base_rng=None,
    source: str = "gaussian",
    sigma_dist: Optional[dict] = None,
    beta_schedule: str = "linear",
    sigma_schedule: str = "brownian_bridge",
    precision: str = "fp32",
) -> Tuple[Callable, Callable]:
    """Build (train_step, eval_step) for diffusion/interpolant training.

    ``source`` selects the interpolant source distribution
    (transport/sources.py: zero | gaussian | reference_state);
    ``sigma_dist`` overrides the EDM training sigma distribution
    (transport/schedules.py:sample_training_sigma_dist kwargs);
    ``beta_schedule``/``sigma_schedule`` pick the interpolant path
    (transport/paths.py)."""
    model = interface.model
    pre = interface.pre_processors
    indices = interface.data_indices
    m = model.n_step_input
    n_out = model.n_step_output
    ia = {ds: _index_arrays(idx) for ds, idx in indices.items()}
    dataset_names = sorted(indices.keys())
    if base_rng is None:
        base_rng = context_key("transport-noise")

    def batch_pre(batch, ds):
        return pre[ds].transform(batch[ds])[
            :, :m, ..., jnp.asarray(ia[ds]["data_input_full"])
        ]

    def targets_and_inputs(batch):
        batch_norm = {ds: pre[ds].transform(batch[ds]) for ds in dataset_names}
        x = {
            ds: batch_norm[ds][:, :m, ..., jnp.asarray(ia[ds]["data_input_full"])]
            for ds in dataset_names
        }
        y = {}
        for ds in dataset_names:
            target = batch_norm[ds][
                :, m : m + n_out, ..., jnp.asarray(ia[ds]["model_out_in_data"])
            ]
            if tendency:
                prev = batch_norm[ds][
                    :, m - 1 : m - 1 + n_out, ..., jnp.asarray(ia[ds]["model_out_in_data"])
                ]
                target = target - prev
            y[ds] = target
        return x, y

    # '16-mixed' discipline as in step.py:151: bf16 compute copies of the
    # fp32 master weights + bf16 model inputs; noise math and loss in fp32
    compute_dtype = (
        jnp.bfloat16 if precision in ("bf16", "bfloat16", "16-mixed") else None
    )

    def _cast(tree):
        if compute_dtype is None:
            return tree
        return jax.tree_util.tree_map(
            lambda p: p.astype(compute_dtype) if p.dtype == jnp.float32 else p,
            tree,
        )

    def loss_fn(params, batch, graph_inputs, rng):
        params = _cast(params)
        x, y = targets_and_inputs(batch)
        x = _cast(x)
        total = 0.0
        if objective == "edm":
            for i, ds in enumerate(dataset_names):
                key = jax.random.fold_in(rng, i)
                y_noised, sigma, weight = edm_training_targets(
                    key, y[ds], edm, sigma_dist=sigma_dist
                )
                _, _, c_in, c_noise = edm_preconditioning(sigma, edm.sigma_data)
                f_out = model.apply(
                    params,
                    x,
                    {ds: _cast(c_in * y_noised)},
                    c_noise[:, 0, :, 0, 0],
                    graph_inputs,
                )
                d = edm_denoise(f_out[ds].astype(jnp.float32), y_noised, sigma, edm)
                total = total + losses[ds](jnp.sqrt(weight) * d, jnp.sqrt(weight) * y[ds])
        elif objective == "interpolant":
            from anemoi_tpu.models.transport.sources import SourceSpec, build_sources

            for i, ds in enumerate(dataset_names):
                key = jax.random.fold_in(rng, i)
                k_init, k_t = jax.random.split(key)
                y0 = build_sources(
                    source,
                    k_init,
                    {ds: SourceSpec.from_tensor(y[ds])},
                    x={ds: batch_pre(batch, ds)},
                    data_indices=indices,
                    n_step_output=n_out,
                )[ds]
                x_t, t, velocity = interpolant_training_targets(
                    k_t, y0, y[ds], interpolant_gamma,
                    beta_schedule=beta_schedule, sigma_schedule=sigma_schedule,
                )
                f_out = model.apply(
                    params, x, {ds: _cast(x_t)}, t[:, 0, :, 0, 0], graph_inputs
                )
                total = total + losses[ds](f_out[ds].astype(jnp.float32), velocity)
        else:
            raise ValueError(f"Unknown transport objective '{objective}'")
        return total / len(dataset_names)

    graph_inputs = interface.graph_inputs

    @jax.jit
    def _train_step(state: TrainState, batch, graph_inputs):
        rng = jax.random.fold_in(base_rng, state.step)
        loss_val, grads = jax.value_and_grad(loss_fn)(state.params, batch, graph_inputs, rng)
        new_state = state.apply_gradients(grads)
        return new_state, {"loss": loss_val, "grad_norm": optax.global_norm(grads)}

    @jax.jit
    def _eval_step(state: TrainState, batch, graph_inputs):
        loss_val = loss_fn(
            state.params, batch, graph_inputs, jax.random.fold_in(base_rng, 2**31 - 1)
        )
        return {"val_loss": loss_val}

    return (
        lambda state, batch: _train_step(state, batch, graph_inputs),
        lambda state, batch: _eval_step(state, batch, graph_inputs),
    )


def make_sampler(
    interface,
    objective: str = "edm",
    sampler: str = "edm_heun",
    num_steps: int = 20,
    schedule: str = "karras",
    edm: EDMConfig = EDMConfig(),
):
    """Build a jitted generation fn(params, x_window, key) -> sample.

    x_window: model-space conditioning {ds: [B, T_in, E, G, V_in]} (normalised).
    Returns the generated model-space output {ds: [B, T_out, E, G, V_out]}.
    """
    model = interface.model
    indices = interface.data_indices
    dataset_names = sorted(indices.keys())
    graph_inputs = interface.inference_graph_inputs
    n_out = model.n_step_output

    if objective == "edm":
        sigmas = jnp.asarray(
            SIGMA_SCHEDULES[schedule](num_steps, edm.sigma_min, edm.sigma_max)
        )
    else:
        times = jnp.asarray(unit_time_schedule(num_steps))
    sample_fn = SAMPLERS[sampler]

    # bf16 serving: the model forward runs in the inference compute dtype,
    # while the sampler integration (sigma math, Heun/DPM updates) stays fp32
    dt = interface.inference_compute_dtype

    @jax.jit
    def _generate(params, x, key, graph_inputs):
        # tables enter as jit ARGUMENTS (constants compile ~13x slower)
        p = interface.cast_inference_params(params)
        xc = {ds: (v.astype(dt) if dt is not None else v) for ds, v in x.items()}
        out = {}
        for i, ds in enumerate(dataset_names):
            idx = indices[ds]
            xd = x[ds]
            b, _, e = xd.shape[0], xd.shape[1], xd.shape[2]
            g = xd.shape[3]
            v = idx.num_model_output_vars
            shape = (b, n_out, e, g, v)
            k = jax.random.fold_in(key, i)

            if objective == "edm":
                def denoise_fn(y, sigma, ds=ds):
                    sig = jnp.broadcast_to(sigma, (b, 1, e, 1, 1)).astype(y.dtype)
                    _, _, c_in, c_noise = edm_preconditioning(sig, edm.sigma_data)
                    xt = c_in * y
                    f = model.apply(
                        p, xc,
                        {ds: xt.astype(dt) if dt is not None else xt},
                        c_noise[:, 0, :, 0, 0], graph_inputs,
                    )
                    return edm_denoise(f[ds].astype(jnp.float32), y, sig, edm)

                y0 = jax.random.normal(k, shape) * sigmas[0]
                out[ds] = sample_fn(denoise_fn, y0, sigmas)
            else:
                def velocity_fn(xt, t, ds=ds):
                    tb = jnp.broadcast_to(t, (b, e)).astype(xt.dtype)
                    xt_c = xt.astype(dt) if dt is not None else xt
                    f = model.apply(p, xc, {ds: xt_c}, tb, graph_inputs)
                    return f[ds].astype(jnp.float32)

                x0 = jax.random.normal(k, shape)
                out[ds] = sample_fn(velocity_fn, x0, times)
        return out

    def generate(params, x, key):
        return _generate(params, x, key, graph_inputs)

    return generate

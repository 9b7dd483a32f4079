"""The jitted training/validation step with autoregressive rollout.

Equivalent of the reference's training method `_step`
(/root/reference/training/src/anemoi/training/train/methods/single.py:28-75)
+ the Forecaster task's input advancement
(/root/reference/training/src/anemoi/training/tasks/forecaster.py:207-228),
redesigned for XLA: the whole rollout is one jitted computation; each rollout
step's forward is wrapped in `jax.checkpoint` (the reference wraps each step
in torch.utils.checkpoint).

Batch layout (data space, un-normalised): {ds: [B, W, E, G, V_data]} with
W = n_step_input + rollout * n_step_output.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from anemoi_tpu.data_indices.collection import IndexCollection


class TrainState(struct.PyTreeNode):
    """Minimal train state (params + optimizer state + step counter)."""

    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, tx):
        return cls(step=jnp.zeros([], jnp.int32), params=params, opt_state=tx.init(params), tx=tx)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params, opt_state=new_opt_state)


def _index_arrays(idx: IndexCollection) -> Dict[str, np.ndarray]:
    """Static index arrays used by the rollout (computed host-side once).

    The per-variable routing of `advance_input` is precomputed as gather maps
    so the rollout contains no scatters: for every model-INPUT variable j,
    - if prognostic: take y_pred[..., from_pred[j]]
    - if forcing:    take batch[..., from_data[j]] at the new time
    (model input = forcing + prognostic exactly, so this covers all j)."""
    n_in = idx.num_model_input_vars
    input_names = idx.model.input.ordered_names
    out_pos = {n: p for p, n in enumerate(idx.model.output.ordered_names)}
    is_prog = np.zeros(n_in, dtype=bool)
    from_pred = np.zeros(n_in, dtype=np.int32)
    from_data = np.zeros(n_in, dtype=np.int32)
    forcing_set = set(idx.forcing)
    for j, name in enumerate(input_names):
        from_data[j] = idx.name_to_index[name]
        if name in forcing_set:
            is_prog[j] = False
        else:
            is_prog[j] = True
            from_pred[j] = out_pos[name]
    model_out_in_data = np.asarray(
        [idx.name_to_index[n] for n in idx.model.output.ordered_names], dtype=np.int32
    )
    return {
        "data_input_full": np.asarray(idx.data.input.full, dtype=np.int32),
        "model_out_in_data": model_out_in_data,
        "is_prog": is_prog,
        "from_pred": from_pred,
        "from_data": from_data,
    }


def advance_input(
    x: jnp.ndarray,  # [B, m, E, G, V_model_in]
    y_pred: jnp.ndarray,  # [B, n_out, E, G, V_model_out]
    batch_norm: jnp.ndarray,  # [B, W, E, G, V_data] normalised
    time_offset: int,
    ia: Dict[str, np.ndarray],
    boundary_mask: Optional[jnp.ndarray] = None,  # [G] True inside the area
) -> jnp.ndarray:
    """Roll the input window one model step forward (ref forecaster.py:207-228):
    shift time, insert predicted prognostics, re-read forcings from the batch.
    Scatter-free: the new steps are assembled with per-variable gathers.

    With a boundary mask (LAM), prognostics OUTSIDE the area are re-forced
    from the truth in the batch (ref tasks/forecaster.py boundary forcing)."""
    n_out = y_pred.shape[1]
    from_pred = jnp.take(y_pred, jnp.asarray(ia["from_pred"]), axis=-1)
    from_data = jnp.take(
        batch_norm[:, time_offset : time_offset + n_out],
        jnp.asarray(ia["from_data"]),
        axis=-1,
    )
    use_pred = jnp.asarray(ia["is_prog"])
    if boundary_mask is not None:
        use_pred = use_pred & boundary_mask[:, None]
    new_steps = jnp.where(use_pred, from_pred, from_data).astype(x.dtype)
    return jnp.concatenate([x[:, n_out:], new_steps], axis=1)


def make_step_fns(
    interface,
    losses: Dict[str, Callable],
    rollout: int,
    remat_rollout: bool = True,
    remat_policy: Optional[str] = None,
    ensemble_size: int = 1,
    base_rng: jnp.ndarray = None,
    output_masks: Optional[Dict[str, "object"]] = None,
    precision: str = "fp32",
    fp32_head: bool = False,
    task: str = "forecaster",
    donate_state: bool = False,
    with_grad_norm: bool = True,
) -> Tuple[Callable, Callable]:
    """Build jitted (train_step, eval_step) closures.

    interface: AnemoiModelInterface (model + pre-processors + indices).
    losses: per-dataset loss callables (pred, target) -> scalar.
    ensemble_size: members to run per sample (EnsembleTraining,
    ref train/methods/ensemble.py:35 -- inputs tiled over the ensemble dim,
    targets stay single-truth for the CRPS loss).
    task: "forecaster" (autoregressive, ref tasks/forecaster.py),
    "autoencoder" (reconstruct the most recent input steps, ref tasks/
    timeless.py:32 -- no time advance, rollout forced to 1), or
    "temporal_downscaler" (ref tasks/temporal_downscaler.py:20 -- inputs are
    the window endpoints, targets the n_step_output interior steps).
    """
    model = interface.model
    pre = interface.pre_processors
    indices = interface.data_indices
    m = model.n_step_input
    n_out = model.n_step_output
    ia = {ds: _index_arrays(idx) for ds, idx in indices.items()}
    dataset_names = sorted(indices.keys())
    if base_rng is None:
        from anemoi_tpu.utils.seeding import context_key

        base_rng = context_key("ensemble-noise")
    boundary = {
        ds: (output_masks[ds].as_array() if output_masks and ds in output_masks else None)
        for ds in dataset_names
    }
    compute_dtype = jnp.bfloat16 if precision in ("bf16", "bfloat16", "16-mixed") else None

    def _cast_params(params):
        """Mixed precision: bf16 compute copies of the fp32 master weights
        (the reference's '16-mixed'; grads flow back to fp32 via the cast).

        fp32_head keeps the decoder output head ('extractor' /
        'node_data_extractor' and its norm) in fp32: the head's matmul then
        promotes its bf16 inputs, so the prognostic increment, residual add
        and boundings all run in fp32 -- the long-horizon-rollout numerics
        experiment from docs/design.md §7 as a config switch."""
        if compute_dtype is None:
            return params

        if not fp32_head:
            return jax.tree_util.tree_map(
                lambda p: p.astype(compute_dtype) if p.dtype == jnp.float32 else p,
                params,
            )

        def cast(path, p):
            if p.dtype != jnp.float32:
                return p
            if any("extractor" in str(getattr(k, "key", k)) for k in path):
                return p
            return p.astype(compute_dtype)

        return jax.tree_util.tree_map_with_path(cast, params)

    # per-group validation metric indices (ref train/methods/base.py:1002-1100:
    # `<metric>/<dataset>/<group>/<step>` in post-processed space)
    from anemoi_tpu.training.metrics import variable_groups

    groups = {
        ds: variable_groups(idx.model.output.ordered_names)
        for ds, idx in indices.items()
    }

    def _group_metrics(metrics_out, y_pred, batch, step, t0, pre_aux=None):
        """Denormalised per-variable-group RMSE for one rollout step."""
        for ds in dataset_names:
            y_phys = pre[ds].inverse_transform(
                y_pred[ds].astype(jnp.float32),
                aux=None if pre_aux is None else pre_aux[ds],
            )
            truth = batch[ds][
                :, t0 : t0 + n_out, ..., jnp.asarray(ia[ds]["model_out_in_data"])
            ]
            sq = (y_phys - truth) ** 2
            valid = ~jnp.isnan(truth) & ~jnp.isnan(y_phys)
            sq = jnp.where(valid, sq, 0.0)
            denom = jnp.maximum(valid.sum(axis=(0, 1, 2, 3)), 1)
            per_var_mse = sq.sum(axis=(0, 1, 2, 3)) / denom  # [V]
            for gname, idxs in groups[ds].items():
                g_mse = jnp.mean(per_var_mse[jnp.asarray(idxs)])
                metrics_out[f"rmse/{ds}/{gname}/{step + 1}"] = jnp.sqrt(g_mse)

    def rollout_loss(params, batch, graph_inputs, rng, with_metrics=False):
        params = _cast_params(params)
        # imputer NaN bookkeeping from the RAW batch (functional equivalent
        # of the reference's cached nan_locations/loss_mask_training,
        # imputer.py:189-241): the loss zeroes weights where an imputed
        # input-and-output variable was NaN
        pre_aux = {ds: pre[ds].compute_aux(batch[ds]) for ds in dataset_names}
        loss_masks = {ds: pre[ds].loss_mask(pre_aux[ds]) for ds in dataset_names}
        batch_norm = {ds: pre[ds].transform(batch[ds]) for ds in dataset_names}
        if task == "temporal_downscaler":
            # inputs = window endpoints (positions 0 and n_out+1)
            assert m == 2, "temporal_downscaler needs n_step_input=2 (endpoints)"
            x = {
                ds: jnp.concatenate(
                    [batch_norm[ds][:, :1], batch_norm[ds][:, n_out + 1 : n_out + 2]],
                    axis=1,
                )[..., jnp.asarray(ia[ds]["data_input_full"])]
                for ds in dataset_names
            }
        else:
            x = {
                ds: batch_norm[ds][:, :m, ..., jnp.asarray(ia[ds]["data_input_full"])]
                for ds in dataset_names
            }
        if compute_dtype is not None:
            x = {ds: v.astype(compute_dtype) for ds, v in x.items()}
        if ensemble_size > 1:
            # tile the (size-1) ensemble dim: every member starts identical,
            # spread comes from the per-member noise rng.  The member axis is
            # sharded over the 'ensemble' mesh axis (ensemble parallelism,
            # ref train/methods/ensemble.py:166-171 gather_ensemble_members):
            # partitionable threefry makes each shard's noise slice identical
            # to the single-device draw, and the CRPS pairwise term below
            # triggers the member all-gather via GSPMD.
            from anemoi_tpu.parallel.mesh import maybe_shard

            x = {
                ds: maybe_shard(
                    jnp.broadcast_to(
                        v, v.shape[:2] + (ensemble_size,) + v.shape[3:]
                    ),
                    ("data", None, "ensemble", None, None),
                )
                for ds, v in x.items()
            }

        # the ensemble model carries the forecast-step index as a constant
        # input channel (ref ens_encoder_processor_decoder.py:70); the
        # rollout loop below is unrolled in Python so fcstep closes over
        # each step's forward as a static value
        uses_fcstep = bool(getattr(model, "fcstep_input", False))

        def make_forward(fcstep):
            def fwd(params, x, key):
                kw = {"fcstep": fcstep} if uses_fcstep else {}
                return model.apply(params, x, graph_inputs, rngs={"noise": key}, **kw)

            if effective_remat:
                from anemoi_tpu.models.layers.processor import resolve_remat_policy

                # remat_policy="save_attention" keeps every Pallas attention
                # kernel's out/lse (mappers + all processor layers) so the
                # rollout backward replays only matmuls/norms, never the
                # kernels (see models/layers/processor.py resolve_remat_policy)
                return jax.checkpoint(fwd, policy=resolve_remat_policy(remat_policy))
            return fwd

        # at rollout 1 there is nothing between rollout steps to free, so the
        # outer checkpoint would only add a full forward recompute (~15% of
        # the flagship step) -- the per-layer remat inside the processor scan
        # already bounds activation memory
        effective_remat = remat_rollout and rollout > 1 and task == "forecaster"

        total = 0.0
        metrics_out: Dict[str, jnp.ndarray] = {}
        effective_rollout = 1 if task in ("autoencoder", "temporal_downscaler") else rollout
        for step in range(effective_rollout):
            y_pred = make_forward(step)(params, x, jax.random.fold_in(rng, step))
            if task == "autoencoder":
                t0 = m - n_out
            elif task == "temporal_downscaler":
                t0 = 1  # interior steps between the endpoints
            else:
                t0 = m + step * n_out
            for ds in dataset_names:
                target = batch_norm[ds][
                    :, t0 : t0 + n_out, ..., jnp.asarray(ia[ds]["model_out_in_data"])
                ]
                # loss in fp32 regardless of compute precision
                total = total + losses[ds](
                    y_pred[ds].astype(jnp.float32), target,
                    mask=loss_masks[ds],
                )
            if with_metrics:
                _group_metrics(metrics_out, y_pred, batch, step, t0, pre_aux)
            if step + 1 < rollout:
                x = {
                    ds: advance_input(
                        x[ds], y_pred[ds], batch_norm[ds], t0, ia[ds],
                        boundary_mask=boundary[ds],
                    )
                    for ds in dataset_names
                }
        loss = total / (effective_rollout * len(dataset_names))
        return (loss, metrics_out) if with_metrics else loss

    graph_inputs = interface.graph_inputs

    # NOTE on buffer donation: donate_argnums=(0,) was measured on chip and
    # bought nothing on SPEED (o96 176 -> 175 ms, n320 within run variance --
    # XLA already overlaps the state output copies with compute), while
    # deleting the caller's right to reuse the initial params pytree (e.g.
    # training the same init at two precisions).  Off by default; opt in via
    # ``training.donate_state``.  It is NOT a reliable HBM lever on this
    # toolchain either: 1024ch non-remat OOMs at 16.03 GB undonated and
    # 17.00 GB donated -- input/output aliasing pushed the scheduler to a
    # WORSE peak (measured round 4), so treat it as semantics, not memory.
    @partial(jax.jit, donate_argnums=(0,) if donate_state else ())
    def _train_step(state: TrainState, batch, graph_inputs):
        rng = jax.random.fold_in(base_rng, state.step)
        loss_val, grads = jax.value_and_grad(rollout_loss)(
            state.params, batch, graph_inputs, rng
        )
        new_state = state.apply_gradients(grads)
        metrics = {"loss": loss_val}
        if with_grad_norm:
            # an extra full read of every gradient leaf; turn off via
            # training.log_grad_norm=false when the metric isn't consumed
            metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    @jax.jit
    def _eval_step(state: TrainState, batch, graph_inputs):
        loss_val, group_metrics = rollout_loss(
            state.params, batch, graph_inputs,
            jax.random.fold_in(base_rng, 2**31 - 1), with_metrics=True,
        )
        return {"val_loss": loss_val, **group_metrics}

    def train_step(state, batch):
        return _train_step(state, batch, graph_inputs)

    def eval_step(state, batch):
        return _eval_step(state, batch, graph_inputs)

    # expose the jitted fn + bound graph arrays for AOT precompilation
    # (trainer._precompile_rollout overlaps the next curriculum rollout's
    # XLA compile with training)
    train_step.jitted = _train_step
    train_step.bound_args = (graph_inputs,)
    return train_step, eval_step

"""Validation metrics in post-processed (physical) space.

Equivalent of the reference's validation metric path
(/root/reference/training/src/anemoi/training/train/methods/base.py:1002-1100):
per-variable RMSE/MSE computed on denormalised predictions, aggregated into
variable groups (surface vs pressure-level parameters) and per rollout step,
logged as ``<metric>/<dataset>/<group>/<step>``.

Also the RolloutEval equivalent (diagnostics/callbacks/evaluation.py:22):
an extended-rollout validation pass reusing the same jitted step.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp

from anemoi_tpu.training.losses.scalers import split_variable_name
from anemoi_tpu.training.step import _index_arrays, advance_input


def variable_groups(names: List[str]) -> Dict[str, List[int]]:
    """Group model-output variables: per-parameter groups for levelled vars
    ('t' for t_850, t_500, ...), plus 'sfc' for the rest."""
    groups: Dict[str, List[int]] = {}
    for i, name in enumerate(names):
        param, level = split_variable_name(name)
        key = param if level is not None else "sfc"
        groups.setdefault(key, []).append(i)
    return groups


def make_rollout_eval_fn(
    interface,
    rollout: int,
    metrics: Tuple[str, ...] = ("rmse",),
    per_timestep: bool = False,
) -> Callable:
    """Jitted fn(params, batch) -> {metric_name: scalar} running an extended
    autoregressive rollout and scoring every step in physical units.

    With ``per_timestep=True`` (ref callbacks/per_timestep_metrics.py:24) the
    first rollout step's prediction is additionally broken down along the
    model's OUTPUT-time dimension — ``<metric>/<ds>/<group>/t_<k>`` keys —
    for tasks predicting several timesteps at once (temporal downscaler)."""
    model = interface.model
    pre = interface.pre_processors
    indices = interface.data_indices
    m = model.n_step_input
    n_out = model.n_step_output
    ia = {ds: _index_arrays(idx) for ds, idx in indices.items()}
    dataset_names = sorted(indices.keys())
    graph_inputs = interface.graph_inputs
    groups = {
        ds: variable_groups(idx.model.output.ordered_names)
        for ds, idx in indices.items()
    }

    @jax.jit
    def rollout_eval(params, batch):
        batch_norm = {ds: pre[ds].transform(batch[ds]) for ds in dataset_names}
        x = {
            ds: batch_norm[ds][:, :m, ..., jnp.asarray(ia[ds]["data_input_full"])]
            for ds in dataset_names
        }
        out: Dict[str, jnp.ndarray] = {}
        for step in range(rollout):
            y_pred = model.apply(params, x, graph_inputs)
            t0 = m + step * n_out
            for ds in dataset_names:
                # physical space: denormalise prediction; truth from raw batch
                y_phys = pre[ds].inverse_transform(y_pred[ds])
                truth = batch[ds][
                    :, t0 : t0 + n_out, ..., jnp.asarray(ia[ds]["model_out_in_data"])
                ]
                sq = (y_phys - truth) ** 2
                valid = ~jnp.isnan(truth)
                sq = jnp.where(valid, sq, 0.0)
                denom = jnp.maximum(valid.sum(axis=(0, 1, 2, 3)), 1)
                per_var_mse = sq.sum(axis=(0, 1, 2, 3)) / denom  # [V]
                if per_timestep and step == 0 and n_out > 1:
                    # [T, V] breakdown over the model's output timesteps
                    denom_t = jnp.maximum(valid.sum(axis=(0, 2, 3)), 1)
                    mse_tv = sq.sum(axis=(0, 2, 3)) / denom_t
                    for gname, idxs in groups[ds].items():
                        g_tv = jnp.mean(mse_tv[:, jnp.asarray(idxs)], axis=1)
                        for t in range(n_out):
                            if "rmse" in metrics:
                                out[f"rmse/{ds}/{gname}/t_{t + 1}"] = jnp.sqrt(g_tv[t])
                            if "mse" in metrics:
                                out[f"mse/{ds}/{gname}/t_{t + 1}"] = g_tv[t]
                for gname, idxs in groups[ds].items():
                    g_mse = jnp.mean(per_var_mse[jnp.asarray(idxs)])
                    if "rmse" in metrics:
                        out[f"rmse/{ds}/{gname}/{step + 1}"] = jnp.sqrt(g_mse)
                    if "mse" in metrics:
                        out[f"mse/{ds}/{gname}/{step + 1}"] = g_mse
            if step + 1 < rollout:
                x = {
                    ds: advance_input(x[ds], y_pred[ds], batch_norm[ds], t0, ia[ds])
                    for ds in dataset_names
                }
        return out

    return rollout_eval

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
from typing import Any, Callable, Dict, Tuple

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
    """Static index arrays used by the rollout (computed host-side once)."""
    model_out_in_data = np.asarray(
        [idx.name_to_index[n] for n in idx.model.output.ordered_names], dtype=np.int32
    )
    forcing_in_data = np.asarray(
        [idx.name_to_index[n] for n in idx.model.input.ordered_names
         if n in set(idx.forcing)],
        dtype=np.int32,
    )
    return {
        "data_input_full": np.asarray(idx.data.input.full, dtype=np.int32),
        "model_out_in_data": model_out_in_data,
        "model_in_prognostic": np.asarray(idx.model.input.prognostic, dtype=np.int32),
        "model_in_forcing": np.asarray(idx.model.input.forcing, dtype=np.int32),
        "model_out_prognostic": np.asarray(idx.model.output.prognostic, dtype=np.int32),
        "forcing_in_data": forcing_in_data,
    }


def advance_input(
    x: jnp.ndarray,  # [B, m, E, G, V_model_in]
    y_pred: jnp.ndarray,  # [B, n_out, E, G, V_model_out]
    batch_norm: jnp.ndarray,  # [B, W, E, G, V_data] normalised
    time_offset: int,
    ia: Dict[str, np.ndarray],
) -> jnp.ndarray:
    """Roll the input window one model step forward (ref forecaster.py:207-228):
    shift time, insert predicted prognostics, re-read forcings from the batch."""
    n_out = y_pred.shape[1]
    x_new = jnp.roll(x, -n_out, axis=1)
    # newest input steps <- prediction's prognostic part + true forcings
    new_steps = x_new[:, -n_out:]
    new_steps = new_steps.at[..., jnp.asarray(ia["model_in_prognostic"])].set(
        y_pred[..., jnp.asarray(ia["model_out_prognostic"])]
    )
    forcing = batch_norm[
        :, time_offset : time_offset + n_out, ..., jnp.asarray(ia["forcing_in_data"])
    ]
    new_steps = new_steps.at[..., jnp.asarray(ia["model_in_forcing"])].set(forcing)
    return x_new.at[:, -n_out:].set(new_steps)


def make_step_fns(
    interface,
    losses: Dict[str, Callable],
    rollout: int,
    remat_rollout: bool = True,
) -> Tuple[Callable, Callable]:
    """Build jitted (train_step, eval_step) closures.

    interface: AnemoiModelInterface (model + pre-processors + indices).
    losses: per-dataset loss callables (pred, target) -> scalar.
    """
    model = interface.model
    pre = interface.pre_processors
    indices = interface.data_indices
    m = model.n_step_input
    n_out = model.n_step_output
    ia = {ds: _index_arrays(idx) for ds, idx in indices.items()}
    dataset_names = sorted(indices.keys())

    def rollout_loss(params, batch):
        batch_norm = {ds: pre[ds].transform(batch[ds]) for ds in dataset_names}
        x = {
            ds: batch_norm[ds][:, :m, ..., jnp.asarray(ia[ds]["data_input_full"])]
            for ds in dataset_names
        }

        def forward(params, x):
            return model.apply(params, x)

        if remat_rollout:
            forward = jax.checkpoint(forward)

        total = 0.0
        for step in range(rollout):
            y_pred = forward(params, x)
            t0 = m + step * n_out
            for ds in dataset_names:
                target = batch_norm[ds][
                    :, t0 : t0 + n_out, ..., jnp.asarray(ia[ds]["model_out_in_data"])
                ]
                total = total + losses[ds](y_pred[ds], target)
            if step + 1 < rollout:
                x = {
                    ds: advance_input(x[ds], y_pred[ds], batch_norm[ds], t0, ia[ds])
                    for ds in dataset_names
                }
        return total / (rollout * len(dataset_names))

    @jax.jit
    def train_step(state: TrainState, batch):
        loss_val, grads = jax.value_and_grad(rollout_loss)(state.params, batch)
        new_state = state.apply_gradients(grads)
        gnorm = optax.global_norm(grads)
        return new_state, {"loss": loss_val, "grad_norm": gnorm}

    @jax.jit
    def eval_step(state: TrainState, batch):
        loss_val = rollout_loss(state.params, batch)
        return {"val_loss": loss_val}

    return train_step, eval_step

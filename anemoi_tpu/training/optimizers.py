"""Optimizers and LR schedules (optax).

Equivalents of the reference's optimizer stack:
- AdamW + cosine-annealed LR with linear warmup
  (config/training/single.yaml lr section, train/methods/base.py:1202)
- AdEMAMix (/root/reference/training/src/anemoi/training/optimizers/AdEMAMix.py:55)
  implemented as a first-class optax gradient transformation.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import chex
import jax
import jax.numpy as jnp
import optax

from anemoi_tpu.utils.registry import Registry

optimizer_registry = Registry("optimizer")


class AdEMAMixState(NamedTuple):
    count: chex.Array
    m1: optax.Updates  # fast EMA
    m2: optax.Updates  # slow EMA
    nu: optax.Updates  # second moment


def scale_by_ademamix(
    b1: float = 0.9,
    b2: float = 0.999,
    b3: float = 0.9999,
    alpha: float = 5.0,
    b3_warmup: Optional[int] = None,
    alpha_warmup: Optional[int] = None,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """AdEMAMix: Adam with an additional slow EMA mixed into the update.

    update = (m1_hat + alpha * m2) / (sqrt(nu_hat) + eps)
    with optional schedulers warming up alpha and b3 (Pagliardini et al. 2024;
    mirrors the reference implementation's schedules).
    """

    def linear_warmup(step, warmup, final, initial):
        if warmup is None:
            return final
        frac = jnp.clip(step / warmup, 0.0, 1.0)
        return initial + frac * (final - initial)

    def b3_scheduler(step):
        # log-space interpolation from b1 to b3 (reference's f_b3)
        if b3_warmup is None:
            return b3

        def log_half_life(beta):
            return jnp.log(0.5) / jnp.log(beta) - 1.0

        frac = jnp.clip(step / b3_warmup, 0.0, 1.0)
        hl = (1.0 - frac) * log_half_life(jnp.asarray(b1)) + frac * log_half_life(
            jnp.asarray(b3)
        )
        return jnp.exp(jnp.log(0.5) / (hl + 1.0))

    def init_fn(params):
        return AdEMAMixState(
            count=jnp.zeros([], jnp.int32),
            m1=jax.tree_util.tree_map(jnp.zeros_like, params),
            m2=jax.tree_util.tree_map(jnp.zeros_like, params),
            nu=jax.tree_util.tree_map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        b3_t = b3_scheduler(count)
        alpha_t = linear_warmup(count, alpha_warmup, alpha, 0.0)

        m1 = jax.tree_util.tree_map(lambda m, g: b1 * m + (1 - b1) * g, state.m1, updates)
        m2 = jax.tree_util.tree_map(lambda m, g: b3_t * m + (1 - b3_t) * g, state.m2, updates)
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1 - b2) * g**2, state.nu, updates
        )
        m1_hat = jax.tree_util.tree_map(lambda m: m / (1 - b1**count), m1)
        nu_hat = jax.tree_util.tree_map(lambda v: v / (1 - b2**count), nu)
        new_updates = jax.tree_util.tree_map(
            lambda mh, m2_, vh: (mh + alpha_t * m2_) / (jnp.sqrt(vh) + eps),
            m1_hat,
            m2,
            nu_hat,
        )
        return new_updates, AdEMAMixState(count=count, m1=m1, m2=m2, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


@optimizer_registry.register("adamw")
def adamw(learning_rate, weight_decay: float = 0.0, b1: float = 0.9, b2: float = 0.95, **_):
    return optax.adamw(learning_rate, b1=b1, b2=b2, weight_decay=weight_decay)


@optimizer_registry.register("adam")
def adam(learning_rate, b1: float = 0.9, b2: float = 0.95, **_):
    return optax.adam(learning_rate, b1=b1, b2=b2)


@optimizer_registry.register("ademamix")
def ademamix(
    learning_rate,
    weight_decay: float = 0.0,
    b1: float = 0.9,
    b2: float = 0.999,
    b3: float = 0.9999,
    alpha: float = 5.0,
    b3_warmup: Optional[int] = None,
    alpha_warmup: Optional[int] = None,
    **_,
):
    chain = [scale_by_ademamix(b1, b2, b3, alpha, b3_warmup, alpha_warmup)]
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*chain)


def build_lr_schedule(config: dict, steps_per_epoch: Optional[int] = None):
    """Warmup + cosine annealing to min LR (ref config training.lr)."""
    rate = float(config.get("rate", 1e-4))
    min_rate = float(config.get("min", 3e-7))
    warmup = int(config.get("warmup", 1000))
    iterations = int(config.get("iterations", 300000))
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=rate,
        warmup_steps=max(warmup, 1),
        decay_steps=max(iterations, warmup + 1),
        end_value=min_rate,
    )


def build_optimizer(config: dict, schedule=None) -> optax.GradientTransformation:
    """Build optimizer chain: clipping -> optimizer(lr schedule)."""
    cfg = dict(config.get("optimizer", {"name": "adamw"}))
    name = cfg.pop("name", "adamw")
    lr = schedule if schedule is not None else build_lr_schedule(config.get("lr", {}))
    opt = optimizer_registry.get(name)(learning_rate=lr, **cfg)

    clip = config.get("gradient_clip", {})
    chain = []
    if clip:
        val = float(clip.get("val", 0.0))
        algorithm = clip.get("algorithm", "value")
        if val > 0 and algorithm == "value":
            chain.append(optax.clip(val))
        elif val > 0 and algorithm == "norm":
            chain.append(optax.clip_by_global_norm(val))
    chain.append(opt)
    return optax.chain(*chain) if len(chain) > 1 else opt

"""Inference schedules for transport samplers (pure numpy/JAX).

Equivalents of /root/reference/models/src/anemoi/models/transport/schedules.py:
- KarrasSigmaSchedule (:116), LinearSigmaSchedule (:147),
  CosineSigmaSchedule (:164), ExponentialSigmaSchedule (:190)
- UnitTimeSchedule (:220) for vector-field (interpolant) samplers
"""

from __future__ import annotations

import numpy as np


def karras_sigma_schedule(
    num_steps: int, sigma_min: float = 0.02, sigma_max: float = 88.0, rho: float = 7.0
) -> np.ndarray:
    """Karras et al. (2022) rho-schedule, descending, with terminal 0."""
    i = np.arange(num_steps)
    s = (
        sigma_max ** (1 / rho)
        + i / max(num_steps - 1, 1) * (sigma_min ** (1 / rho) - sigma_max ** (1 / rho))
    ) ** rho
    return np.concatenate([s, [0.0]]).astype(np.float32)


def linear_sigma_schedule(num_steps: int, sigma_min: float = 0.02, sigma_max: float = 88.0) -> np.ndarray:
    s = np.linspace(sigma_max, sigma_min, num_steps)
    return np.concatenate([s, [0.0]]).astype(np.float32)


def cosine_sigma_schedule(num_steps: int, sigma_min: float = 0.02, sigma_max: float = 88.0) -> np.ndarray:
    i = np.linspace(0, 1, num_steps)
    s = sigma_min + 0.5 * (sigma_max - sigma_min) * (1 + np.cos(np.pi * i))
    return np.concatenate([s, [0.0]]).astype(np.float32)


def exponential_sigma_schedule(num_steps: int, sigma_min: float = 0.02, sigma_max: float = 88.0) -> np.ndarray:
    s = np.exp(np.linspace(np.log(sigma_max), np.log(sigma_min), num_steps))
    return np.concatenate([s, [0.0]]).astype(np.float32)


def unit_time_schedule(num_steps: int) -> np.ndarray:
    """t from 0 to 1 inclusive (vector-field integration grid)."""
    return np.linspace(0.0, 1.0, num_steps + 1).astype(np.float32)


SIGMA_SCHEDULES = {
    "karras": karras_sigma_schedule,
    "linear": linear_sigma_schedule,
    "cosine": cosine_sigma_schedule,
    "exponential": exponential_sigma_schedule,
}


# ----------------------------------------------------------------------
# training condition distributions (ref schedules.py:231-350): draw the
# per-sample training sigma / time by pushing u~U(0,1) (or a stratified
# variant) through the inverse schedule maps
# ----------------------------------------------------------------------
def _unit_time_base(key, shape, stratified: bool = False):
    import jax

    u = jax.random.uniform(key, shape)
    if stratified:
        # one stratum per batch element along axis 0 (low-discrepancy draw)
        import jax.numpy as jnp

        n = shape[0]
        offsets = jnp.arange(n, dtype=u.dtype).reshape((n,) + (1,) * (len(shape) - 1))
        u = (u + offsets) / n
    return u


def sample_training_sigma_dist(
    key,
    shape,
    *,
    kind: str = "lognormal",
    sigma_min: float = 0.02,
    sigma_max: float = 88.0,
    rho: float = 7.0,
    s: float = 0.008,
    p_mean: float = -1.2,
    p_std: float = 1.2,
    stratified: bool = False,
):
    """Training sigma distribution (ref schedules.py:264-335).

    kinds: lognormal (EDM), karras, linear, exponential, cosine -- the latter
    four map u~U(0,1) through the corresponding sigma-from-unit-time curve."""
    import jax
    import jax.numpy as jnp

    if kind == "lognormal":
        return jnp.exp(p_mean + p_std * jax.random.normal(key, shape))
    u = _unit_time_base(key, shape, stratified)
    if kind == "karras":
        from anemoi_tpu.models.transport.paths import karras_sigma_from_unit_time

        return karras_sigma_from_unit_time(
            u, sigma_max=sigma_max, sigma_min=sigma_min, rho=rho
        )
    if kind == "linear":
        return sigma_max + u * (sigma_min - sigma_max)
    if kind == "exponential":
        log_hi, log_lo = np.log(sigma_max), np.log(sigma_min)
        return jnp.exp(log_hi + u * (log_lo - log_hi))
    if kind == "cosine":
        # ref schedules.py:364-379: squared-cosine (Nichol & Dhariwal) alphas
        f = jnp.cos((u + s) / (1 + s) * np.pi / 2) ** 2
        f0 = np.cos(s / (1 + s) * np.pi / 2) ** 2
        alpha = jnp.clip(f / f0, 1e-8, 1.0)
        sigma = jnp.sqrt((1 - alpha) / alpha)
        return jnp.clip(sigma, sigma_min, sigma_max)
    raise ValueError(f"Unknown training sigma distribution '{kind}'")


def sample_training_time(key, shape, *, stratified: bool = False):
    """Uniform interpolation-time distribution (ref schedules.py:338-350)."""
    return _unit_time_base(key, shape, stratified)

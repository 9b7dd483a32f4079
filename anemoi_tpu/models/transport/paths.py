"""Interpolation-path math shared by transport objectives and samplers.

Pure-JAX equivalents of
/root/reference/models/src/anemoi/models/transport/paths.py:14-143: the Karras
unit-time -> sigma map, the EDM loss weight, the sampler time grid, and the
stochastic-interpolant alpha/beta/sigma schedules with their time derivatives.
"""

from __future__ import annotations

import jax.numpy as jnp


def karras_sigma_from_unit_time(t, *, sigma_max: float, sigma_min: float, rho: float):
    """Map t in [0, 1] to the Karras EDM noise schedule (ref paths.py:15-25)."""
    hi = sigma_max ** (1.0 / rho)
    lo = sigma_min ** (1.0 / rho)
    return (hi + t * (lo - hi)) ** rho


def edm_loss_weight(sigma, sigma_data: float):
    """EDM lambda(sigma) (ref paths.py:28-30)."""
    return (sigma**2 + sigma_data**2) / (sigma * sigma_data) ** 2


def unit_time_grid(num_steps: int, dtype=jnp.float32):
    """[num_steps+1] grid from 0 to 1 (ref paths.py:33-42)."""
    if num_steps < 1:
        raise ValueError("Transport num_steps must be at least 1.")
    return jnp.linspace(0.0, 1.0, int(num_steps) + 1, dtype=dtype)


def _brownian_bridge_variance(t):
    return 2.0 * t * (1.0 - t)


def interpolant_alpha(t, schedule: str = "linear"):
    """Source-field weight along the interpolant bridge (ref paths.py:49-53)."""
    if schedule != "linear":
        raise ValueError(f"Unsupported interpolant alpha schedule: {schedule}")
    return 1.0 - t


def interpolant_beta(t, schedule: str = "linear"):
    """Target-field weight (ref paths.py:56-62)."""
    if schedule == "linear":
        return t
    if schedule == "quadratic":
        return jnp.square(t)
    raise ValueError(f"Unsupported interpolant beta schedule: {schedule}")


def interpolant_sigma(t, *, schedule: str = "brownian_bridge", noise_scale: float = 1.0):
    """Noise amplitude of the bridge (ref paths.py:65-74)."""
    if schedule == "brownian_bridge":
        return noise_scale * jnp.sqrt(jnp.clip(_brownian_bridge_variance(t), 0.0))
    if schedule == "quadratic_bridge":
        return noise_scale * t * (1.0 - t)
    raise ValueError(f"Unsupported interpolant sigma schedule: {schedule}")


def interpolant_alpha_dot(t, schedule: str = "linear"):
    """d alpha / dt (ref paths.py:77-81)."""
    if schedule != "linear":
        raise ValueError(f"Unsupported interpolant alpha schedule: {schedule}")
    return -jnp.ones_like(t)


def interpolant_beta_dot(t, schedule: str = "linear"):
    """d beta / dt (ref paths.py:84-92)."""
    if schedule == "linear":
        return jnp.ones_like(t)
    if schedule == "quadratic":
        return 2.0 * t
    raise ValueError(f"Unsupported interpolant beta schedule: {schedule}")


def interpolant_sigma_dot(
    t, *, schedule: str = "brownian_bridge", noise_scale: float = 1.0, eps: float = 1e-6
):
    """d sigma / dt, guarded at the endpoints (ref paths.py:95-110)."""
    if schedule == "brownian_bridge":
        var = jnp.clip(_brownian_bridge_variance(t), eps)
        return noise_scale * (1.0 - 2.0 * t) / jnp.sqrt(var)
    if schedule == "quadratic_bridge":
        return noise_scale * (1.0 - 2.0 * t)
    raise ValueError(f"Unsupported interpolant sigma schedule: {schedule}")

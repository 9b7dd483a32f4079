"""Transport training objectives (pure JAX).

Equivalents of /root/reference/models/src/anemoi/models/transport/objectives.py:
- EDM diffusion (Karras et al. 2022) preconditioning + loss weighting
  (ref :102-219: c_skip/c_out/c_in/c_noise and the sigma-weighted MSE)
- stochastic-interpolant velocity objective (ref :222-300)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class EDMConfig:
    sigma_data: float = 1.0
    sigma_min: float = 0.02
    sigma_max: float = 88.0
    p_mean: float = -1.2  # log-normal training sigma distribution
    p_std: float = 1.2


def edm_preconditioning(sigma: jnp.ndarray, sigma_data: float):
    """Karras preconditioning coefficients (ref objectives.py:189-219).

    sigma broadcastable to the state; returns (c_skip, c_out, c_in, c_noise).
    """
    s2 = sigma**2
    d2 = sigma_data**2
    c_skip = d2 / (s2 + d2)
    c_out = sigma * sigma_data / jnp.sqrt(s2 + d2)
    c_in = 1.0 / jnp.sqrt(s2 + d2)
    c_noise = jnp.log(sigma) / 4.0
    return c_skip, c_out, c_in, c_noise


def sample_training_sigma(key: jax.Array, shape, cfg: EDMConfig) -> jnp.ndarray:
    """sigma ~ exp(N(p_mean, p_std)) (EDM training distribution)."""
    return jnp.exp(cfg.p_mean + cfg.p_std * jax.random.normal(key, shape))


def edm_training_targets(
    key: jax.Array, y: jnp.ndarray, cfg: EDMConfig, sigma_dist: dict = None
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Draw sigma + noise for one EDM training step.

    y: clean target [B, T, E, G, V]. sigma is drawn per (batch, ensemble)
    sample (ref draws one sigma per sample).  ``sigma_dist`` (kwargs of
    schedules.sample_training_sigma_dist) switches the training sigma
    distribution away from the EDM log-normal.  Returns
    (y_noised, sigma_b [B,1,E,1,1], loss_weight same shape)."""
    b, t, e = y.shape[0], y.shape[1], y.shape[2]
    k_sigma, k_noise = jax.random.split(key)
    if sigma_dist:
        from anemoi_tpu.models.transport.schedules import sample_training_sigma_dist

        sigma = sample_training_sigma_dist(
            k_sigma, (b, 1, e, 1, 1), **sigma_dist
        ).astype(y.dtype)
    else:
        sigma = sample_training_sigma(k_sigma, (b, 1, e, 1, 1), cfg).astype(y.dtype)
    noise = jax.random.normal(k_noise, y.shape, dtype=y.dtype)
    y_noised = y + sigma * noise
    weight = (sigma**2 + cfg.sigma_data**2) / (sigma * cfg.sigma_data) ** 2
    return y_noised, sigma, weight


def edm_denoise(model_out: jnp.ndarray, y_noised: jnp.ndarray, sigma: jnp.ndarray, cfg: EDMConfig):
    """D(y; sigma) = c_skip*y + c_out*F (ref :115-124). model_out = F(c_in*y, c_noise)."""
    c_skip, c_out, _, _ = edm_preconditioning(sigma, cfg.sigma_data)
    return c_skip * y_noised + c_out * model_out


def interpolant_training_targets(
    key: jax.Array,
    y0: jnp.ndarray,
    y1: jnp.ndarray,
    gamma: float = 0.0,
    *,
    beta_schedule: str = "linear",
    sigma_schedule: str = "brownian_bridge",
    stratified: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Stochastic interpolant x_t = alpha(t) y0 + beta(t) y1 + gamma sigma(t) z
    with velocity target dx_t/dt (ref objectives.py:222-300 + paths.py).

    ``gamma`` scales the bridge noise (0 = deterministic interpolant).
    Returns (x_t, t [B,1,E,1,1], velocity)."""
    from anemoi_tpu.models.transport.paths import (
        interpolant_alpha,
        interpolant_alpha_dot,
        interpolant_beta,
        interpolant_beta_dot,
        interpolant_sigma,
        interpolant_sigma_dot,
    )
    from anemoi_tpu.models.transport.schedules import sample_training_time

    b, _, e = y0.shape[0], y0.shape[1], y0.shape[2]
    k_t, k_z = jax.random.split(key)
    t = sample_training_time(k_t, (b, 1, e, 1, 1), stratified=stratified).astype(
        y0.dtype
    )
    alpha = interpolant_alpha(t)
    beta = interpolant_beta(t, beta_schedule)
    x_t = alpha * y0 + beta * y1
    velocity = interpolant_alpha_dot(t) * y0 + interpolant_beta_dot(t, beta_schedule) * y1
    if gamma > 0:
        z = jax.random.normal(k_z, y0.shape, dtype=y0.dtype)
        x_t = x_t + gamma * interpolant_sigma(t, schedule=sigma_schedule) * z
        velocity = velocity + gamma * interpolant_sigma_dot(t, schedule=sigma_schedule) * z
    return x_t, t, velocity


def fourier_time_embedding(t: jnp.ndarray, dim: int = 16, max_freq: float = 16.0) -> jnp.ndarray:
    """sin/cos embedding of a scalar noise level / time per sample."""
    half = dim // 2
    freqs = jnp.exp(jnp.linspace(0.0, jnp.log(max_freq), half))
    ang = t[..., None] * freqs  # [..., half]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


def random_fourier_time_embedding(
    t: jnp.ndarray, dim: int = 32, scale: float = 16.0, seed: int = 0
) -> jnp.ndarray:
    """Random Fourier noise-level embedding (ref layers/diffusion.py:15
    RandomFourierEmbeddings): frequencies ~ N(0, scale^2), fixed by seed (the
    reference freezes them as a buffer at init)."""
    half = dim // 2
    freqs = jax.random.normal(jax.random.PRNGKey(seed), (half,)) * scale
    ang = t[..., None] * freqs * (2.0 * jnp.pi)
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


def sinusoidal_time_embedding(
    t: jnp.ndarray, dim: int = 32, max_period: float = 10000.0
) -> jnp.ndarray:
    """Transformer-style sinusoidal noise-level embedding (ref
    layers/diffusion.py:28 SinusoidalEmbeddings)."""
    half = dim // 2
    freqs = jnp.exp(-jnp.log(max_period) * jnp.arange(half) / half)
    ang = t[..., None] * freqs
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


TIME_EMBEDDINGS = {
    "fourier": fourier_time_embedding,
    "random_fourier": random_fourier_time_embedding,
    "sinusoidal": sinusoidal_time_embedding,
}

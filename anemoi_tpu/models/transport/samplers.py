"""Inference-time ODE/SDE samplers (pure JAX, scan-based).

Equivalents of /root/reference/models/src/anemoi/models/samplers/transport_samplers.py:42-358:
- EDM Euler and Heun (2nd order) samplers over a sigma schedule
- DPM++2M multistep sampler
- vector-field Euler/Heun for stochastic-interpolant models

Each sampler takes ``denoise_fn(y, sigma) -> D`` (or ``velocity_fn(x, t)``)
and integrates with `lax.scan` so the whole sampling loop is one XLA program.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def edm_euler_sample(denoise_fn: Callable, y_init: jnp.ndarray, sigmas: jnp.ndarray) -> jnp.ndarray:
    """1st-order Euler over the sigma schedule (descending, last entry 0)."""

    def step(y, i):
        s, s_next = sigmas[i], sigmas[i + 1]
        d = (y - denoise_fn(y, s)) / s
        return y + (s_next - s) * d, ()

    y, _ = jax.lax.scan(step, y_init, jnp.arange(len(sigmas) - 1))
    return y


def edm_heun_sample(denoise_fn: Callable, y_init: jnp.ndarray, sigmas: jnp.ndarray) -> jnp.ndarray:
    """EDM 2nd-order Heun sampler (ref transport_samplers.py EDM Heun)."""

    def step(y, i):
        s, s_next = sigmas[i], sigmas[i + 1]
        d = (y - denoise_fn(y, s)) / s
        y_euler = y + (s_next - s) * d

        def heun_correct(_):
            d2 = (y_euler - denoise_fn(y_euler, s_next)) / s_next
            return y + (s_next - s) * 0.5 * (d + d2)

        y_new = jax.lax.cond(s_next > 0, heun_correct, lambda _: y_euler, None)
        return y_new, ()

    y, _ = jax.lax.scan(step, y_init, jnp.arange(len(sigmas) - 1))
    return y


def dpmpp_2m_sample(denoise_fn: Callable, y_init: jnp.ndarray, sigmas: jnp.ndarray) -> jnp.ndarray:
    """DPM-Solver++(2M) multistep sampler over sigma (log-space lambda)."""

    def lam(s):
        return -jnp.log(jnp.maximum(s, 1e-10))

    def step(carry, i):
        y, old_denoised, have_old = carry
        s, s_next = sigmas[i], sigmas[i + 1]
        denoised = denoise_fn(y, s)

        def final(_):
            return denoised

        def not_final(_):
            h = lam(s_next) - lam(s)
            h_last = lam(s) - lam(sigmas[jnp.maximum(i - 1, 0)])
            r = h_last / jnp.maximum(h, 1e-10)
            d_eff = jnp.where(
                have_old,
                (1 + 1 / (2 * r)) * denoised - (1 / (2 * r)) * old_denoised,
                denoised,
            )
            return (s_next / s) * y - jnp.expm1(-h) * d_eff

        y_new = jax.lax.cond(s_next <= 0, final, not_final, None)
        return (y_new, denoised, jnp.asarray(True)), ()

    init = (y_init, jnp.zeros_like(y_init), jnp.asarray(False))
    (y, _, _), _ = jax.lax.scan(step, init, jnp.arange(len(sigmas) - 1))
    return y


def vector_field_euler_sample(velocity_fn: Callable, x_init: jnp.ndarray, times: jnp.ndarray) -> jnp.ndarray:
    """Euler integration of dx/dt = b(x, t) over an ascending time grid."""

    def step(x, i):
        t, t_next = times[i], times[i + 1]
        return x + (t_next - t) * velocity_fn(x, t), ()

    x, _ = jax.lax.scan(step, x_init, jnp.arange(len(times) - 1))
    return x


def vector_field_heun_sample(velocity_fn: Callable, x_init: jnp.ndarray, times: jnp.ndarray) -> jnp.ndarray:
    def step(x, i):
        t, t_next = times[i], times[i + 1]
        dt = t_next - t
        v1 = velocity_fn(x, t)
        v2 = velocity_fn(x + dt * v1, t_next)
        return x + dt * 0.5 * (v1 + v2), ()

    x, _ = jax.lax.scan(step, x_init, jnp.arange(len(times) - 1))
    return x


SAMPLERS = {
    "edm_euler": edm_euler_sample,
    "edm_heun": edm_heun_sample,
    "dpmpp_2m": dpmpp_2m_sample,
    "vf_euler": vector_field_euler_sample,
    "vf_heun": vector_field_heun_sample,
}

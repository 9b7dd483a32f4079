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

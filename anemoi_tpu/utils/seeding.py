"""Deterministic seeding utilities.

Mirrors the behaviour of the reference's context-separated seed derivation
(/root/reference/training/src/anemoi/training/utils/seeding.py:17-48): a base
seed from the environment, with derived seeds per named context so that e.g.
model-init randomness and data-shuffling randomness are independent streams.

TPU-native twist: everything maps onto `jax.random.PRNGKey` / `fold_in`, so the
same base seed produces identical streams on any device count.
"""

from __future__ import annotations

import hashlib
import os

import jax

BASE_SEED_ENV = "ANEMOI_BASE_SEED"
DEFAULT_BASE_SEED = 42


def get_base_seed() -> int:
    """Base seed from ``ANEMOI_BASE_SEED`` (defaults to 42)."""
    raw = os.environ.get(BASE_SEED_ENV, "")
    if raw:
        seed = int(raw)
        # the reference upscales small seeds into a healthy entropy range
        if seed < 1000:
            seed = seed * 1000
        return seed
    return DEFAULT_BASE_SEED


def context_seed(context: str, base_seed: int | None = None) -> int:
    """Derive a deterministic 31-bit seed for a named context."""
    if base_seed is None:
        base_seed = get_base_seed()
    digest = hashlib.sha256(f"{base_seed}:{context}".encode()).digest()
    return int.from_bytes(digest[:4], "little") & 0x7FFFFFFF


def context_key(context: str, base_seed: int | None = None) -> jax.Array:
    """A `jax.random.PRNGKey` for a named context."""
    return jax.random.PRNGKey(context_seed(context, base_seed))


def fold_in_step(key: jax.Array, step: int) -> jax.Array:
    return jax.random.fold_in(key, step)

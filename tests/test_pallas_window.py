"""Flash sliding-window attention kernel parity (interpret mode on CPU;
the same kernel compiles through Mosaic on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from anemoi_tpu.models.layers.attention import _window_attention
from anemoi_tpu.ops.pallas.window_attention import (
    PALLAS_AVAILABLE,
    _flash_window,
)

pytestmark = pytest.mark.skipif(not PALLAS_AVAILABLE, reason="pallas unavailable")


def _ref(q, k, v, w, softcap=None, slopes=None, valid_len=None, h=2):
    bh, n, d = q.shape
    b = bh // h

    def split(x):
        return jnp.transpose(x.reshape(b, h, n, d), (0, 2, 1, 3))

    out = _window_attention(
        split(q), split(k), split(v), w, softcap,
        None if slopes is None else jnp.asarray(slopes), valid_len=valid_len
    )
    return jnp.transpose(out, (0, 2, 1, 3)).reshape(bh, n, d)


@pytest.mark.parametrize("softcap", [None, 5.0])
def test_flash_window_matches_xla(rng, softcap):
    w, n, d, h, b = 16, 64, 32, 2, 1
    q = jnp.asarray(rng.normal(size=(b * h, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b * h, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b * h, n, d)), jnp.float32)
    out = _flash_window(q, k, v, w, softcap, n, h, None, True)
    ref = _ref(q, k, v, w, softcap=softcap, h=h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-6)


def test_flash_window_valid_len_and_alibi(rng):
    w, n, d, h = 16, 64, 32, 2
    valid = 50  # pad rows at the end
    slopes = (0.25, 0.0625)
    q = jnp.asarray(rng.normal(size=(h, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(h, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(h, n, d)), jnp.float32)
    out = _flash_window(q, k, v, w, None, valid, h, slopes, True)
    ref = _ref(q, k, v, w, slopes=slopes, valid_len=valid, h=h)
    # pad-query rows produce garbage the caller slices away; compare valid rows
    np.testing.assert_allclose(
        np.asarray(out)[:, :valid], np.asarray(ref)[:, :valid], rtol=2e-5, atol=2e-6
    )


def test_flash_window_gradients_match(rng):
    w, n, d, h = 16, 48, 32, 2
    q = jnp.asarray(rng.normal(size=(h, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(h, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(h, n, d)), jnp.float32)

    def loss_pallas(q, k, v):
        return jnp.sum(_flash_window(q, k, v, w, None, n, h, None, True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_ref(q, k, v, w, h=h) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6)


def test_window_attention_pallas_wrapper(rng):
    from anemoi_tpu.ops.pallas.window_attention import window_attention_pallas

    # n NOT a multiple of w: wrapper pads and slices
    w, n, d, h, b = 16, 52, 32, 2, 2
    q = jnp.asarray(rng.normal(size=(b, n, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, n, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, n, h, d)), jnp.float32)
    import anemoi_tpu.ops.pallas.window_attention as mod

    class _Interp:
        """Force interpret mode through the wrapper on CPU."""

        def __enter__(self):
            self.orig = mod._flash_window

            def wrapped(q, k, v, w, sc, vl, nh, sl, interp):
                return self.orig(q, k, v, w, sc, vl, nh, sl, True)

            mod._flash_window = wrapped
            return self

        def __exit__(self, *a):
            mod._flash_window = self.orig

    with _Interp():
        out = window_attention_pallas(q, k, v, w)
    ref = _window_attention(q, k, v, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-6)


def test_flash_window_gradients_alibi_validlen(rng):
    """Flash backward with ALiBi bias and trailing pad rows."""
    w, n, d, h = 16, 64, 32, 2
    valid = 55
    slopes = (0.5, 0.125)
    q = jnp.asarray(rng.normal(size=(h, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(h, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(h, n, d)), jnp.float32)

    def loss_pallas(q, k, v):
        out = _flash_window(q, k, v, w, None, valid, h, slopes, True)
        return jnp.sum(out[:, :valid] ** 2)

    def loss_ref(q, k, v):
        out = _ref(q, k, v, w, slopes=slopes, valid_len=valid, h=h)
        return jnp.sum(out[:, :valid] ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6)

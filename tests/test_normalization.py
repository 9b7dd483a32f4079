"""Norm layer unit tests (LayerNorm/RMSNorm/ConditionalLayerNorm/QKNorm):
fp32 statistics under bf16 inputs, zero-init conditioning identity, and the
reference's qk-norm kernel semantics (AutocastLayerNorm(bias=False))."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from anemoi_tpu.models.layers.normalization import (
    ConditionalLayerNorm,
    LayerNorm,
    QKNorm,
    RMSNorm,
)


@pytest.fixture()
def x32(rng):
    return jnp.asarray(rng.normal(size=(3, 7, 16)) * 3 + 1, jnp.float32)


def test_layernorm_stats_and_dtype(x32, rng):
    mod = LayerNorm()
    params = mod.init(jax.random.PRNGKey(0), x32)
    y = mod.apply(params, x32)
    np.testing.assert_allclose(np.asarray(y.mean(-1)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y.std(-1)), 1.0, atol=1e-3)
    # bf16 in -> bf16 out, statistics computed in fp32
    y16 = mod.apply(params, x32.astype(jnp.bfloat16))
    assert y16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(y16, np.float32), np.asarray(y), atol=2e-2
    )


def test_rmsnorm_no_mean_subtraction(x32):
    mod = RMSNorm()
    params = mod.init(jax.random.PRNGKey(0), x32)
    y = np.asarray(mod.apply(params, x32))
    xn = np.asarray(x32)
    expect = xn / np.sqrt((xn**2).mean(-1, keepdims=True) + 1e-6)
    np.testing.assert_allclose(y, expect, atol=1e-5)


def test_conditional_layernorm_zero_init_is_plain_ln(x32, rng):
    cond = jnp.asarray(rng.normal(size=(3, 7, 4)), jnp.float32)
    mod = ConditionalLayerNorm()
    params = mod.init(jax.random.PRNGKey(0), x32, cond)
    y = np.asarray(mod.apply(params, x32, cond))
    # zero-init scale/bias projections: output == unconditioned LN(x)
    ln = LayerNorm(use_scale=False, use_bias=False)
    yp = np.asarray(ln.apply(ln.init(jax.random.PRNGKey(0), x32), x32))
    np.testing.assert_allclose(y, yp, atol=1e-5)
    # with nonzero projections, conditioning changes the output
    params2 = jax.tree_util.tree_map(lambda p: p + 0.1, params)
    y2 = np.asarray(mod.apply(params2, x32, cond))
    assert not np.allclose(y2, y)


@pytest.mark.parametrize("kind", ["layernorm", "rmsnorm"])
def test_qknorm_kinds(x32, kind):
    mod = QKNorm(kind)
    params = mod.init(jax.random.PRNGKey(0), x32)
    y = np.asarray(mod.apply(params, x32))
    assert np.isfinite(y).all()
    if kind == "layernorm":
        # reference kernel: LN without bias -> zero mean per row
        np.testing.assert_allclose(y.mean(-1), 0.0, atol=1e-5)
    else:
        rms = np.sqrt((y**2).mean(-1))
        np.testing.assert_allclose(rms, 1.0, atol=1e-3)

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from anemoi_tpu.models.layers.attention import (
    MultiHeadCrossAttention,
    MultiHeadSelfAttention,
    _window_attention,
    get_alibi_slopes,
)


def test_alibi_slopes():
    s = get_alibi_slopes(8)
    assert s.shape == (8,)
    assert np.all(np.diff(np.asarray(s)) < 0)  # decreasing
    s12 = get_alibi_slopes(12)
    assert s12.shape == (12,)


def test_window_attention_matches_masked_dense(rng):
    b, n, h, d = 2, 40, 2, 8
    w = 8
    q = jnp.asarray(rng.normal(size=(b, n, h, d)), dtype=jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, n, h, d)), dtype=jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, n, h, d)), dtype=jnp.float32)

    out = _window_attention(q, k, v, window_size=w)

    # dense reference with |i-j| <= w band mask
    logits = np.einsum("bnhd,bmhd->bhnm", q, k) / np.sqrt(d)
    pos = np.arange(n)
    band = np.abs(pos[:, None] - pos[None, :]) <= w
    logits = np.where(band[None, None], logits, -np.inf)
    alpha = np.exp(logits - logits.max(-1, keepdims=True))
    alpha = alpha / alpha.sum(-1, keepdims=True)
    expected = np.einsum("bhnm,bmhd->bnhd", alpha, np.asarray(v))
    np.testing.assert_allclose(np.asarray(out), expected, atol=2e-5)


def test_full_attention_when_window_none(rng):
    b, n, h, d = 1, 16, 2, 4
    q = jnp.asarray(rng.normal(size=(b, n, h, d)), dtype=jnp.float32)
    out = _window_attention(q, q, q, window_size=None)
    assert out.shape == (b, n, h, d)
    assert np.isfinite(np.asarray(out)).all()


def test_mhsa_module(rng):
    x = jnp.asarray(rng.normal(size=(2, 30, 32)), dtype=jnp.float32)
    attn = MultiHeadSelfAttention(num_heads=4, window_size=8, qk_norm=True)
    params = attn.init(jax.random.PRNGKey(0), x)
    out = attn.apply(params, x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_cross_attention(rng):
    src = jnp.asarray(rng.normal(size=(1, 20, 16)), dtype=jnp.float32)
    dst = jnp.asarray(rng.normal(size=(1, 12, 16)), dtype=jnp.float32)
    attn = MultiHeadCrossAttention(num_heads=4)
    params = attn.init(jax.random.PRNGKey(0), src, dst)
    out = attn.apply(params, src, dst)
    assert out.shape == dst.shape


def test_transformer_processor_model(tiny_graph, rng):
    """Full model with TransformerProcessor flavour."""
    from tests.test_models import build_interface, model_config

    cfg = model_config()
    cfg["processor"] = {"name": "TransformerProcessor", "num_layers": 2,
                        "num_heads": 4, "window_size": 16, "mlp_hidden_ratio": 2.0}
    from anemoi_tpu.models.interface import AnemoiModelInterface
    from tests.test_models import make_indices, make_statistics

    iface = AnemoiModelInterface(
        config={"model": cfg, "data": {"processors": []}},
        graph=tiny_graph,
        data_indices={"data": make_indices()},
        statistics={"data": make_statistics()},
    )
    params = iface.init_params(jax.random.PRNGKey(0))
    n_grid = tiny_graph["data"].num_nodes
    x = {"data": jnp.asarray(rng.normal(size=(1, 2, 1, n_grid, 5)), dtype=jnp.float32)}
    out = iface.apply(params, x)
    assert out["data"].shape == (1, 1, 1, n_grid, 4)
    assert np.isfinite(np.asarray(out["data"])).all()


def test_rotary_embeddings(rng):
    """RoPE (ref attention.py:381-399): norm-preserving, identity at position
    0, and relative -- logits depend only on position offsets."""
    import jax.numpy as jnp

    from anemoi_tpu.models.layers.attention import (
        MultiHeadSelfAttention,
        apply_rotary_embeddings,
    )

    n, h, d = 12, 2, 8
    q = jnp.asarray(rng.normal(size=(n, h, d)), dtype=jnp.float32)
    k = jnp.asarray(rng.normal(size=(n, h, d)), dtype=jnp.float32)
    qr, kr = apply_rotary_embeddings(q, k)
    assert qr.shape == q.shape
    # rotations preserve per-position norms
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(qr), axis=-1),
        np.linalg.norm(np.asarray(q), axis=-1), atol=1e-5,
    )
    # position 0 is the identity rotation
    np.testing.assert_allclose(np.asarray(qr)[0], np.asarray(q)[0], atol=1e-6)

    # relative-position property: <rot(q,i), rot(k,j)> depends only on i-j.
    # Shift both positions by s by feeding longer sequences of repeated rows.
    qq = jnp.broadcast_to(q[0], (n, h, d))
    kk = jnp.broadcast_to(k[0], (n, h, d))
    qs, ks = apply_rotary_embeddings(qq, kk)
    dots = np.einsum("nhd,nhd->nh", np.asarray(qs)[2:], np.asarray(ks)[:-2])
    np.testing.assert_allclose(
        dots, np.broadcast_to(dots[0], dots.shape), atol=1e-4
    )  # offset 2 everywhere

    # MHSA integration: runs, and rotary changes the output
    mh = MultiHeadSelfAttention(num_heads=2, window_size=4, use_rotary_embeddings=True)
    x = jnp.asarray(rng.normal(size=(1, n, 16)), dtype=jnp.float32)
    params = mh.init(jax.random.PRNGKey(0), x)
    out_r = mh.apply(params, x)
    out_p = MultiHeadSelfAttention(num_heads=2, window_size=4).apply(params, x)
    assert out_r.shape == x.shape
    assert np.abs(np.asarray(out_r) - np.asarray(out_p)).max() > 1e-4

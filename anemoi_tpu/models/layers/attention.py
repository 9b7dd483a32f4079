"""Dense multi-head attention with sliding windows (flax.linen).

Equivalent of /root/reference/models/src/anemoi/models/layers/attention.py:
- MultiHeadSelfAttention (:41) with sliding-window locality, qk-norm, softcap
  and ALiBi slopes (get_alibi_slopes :545)
- MultiHeadCrossAttention (:523)

TPU-native formulation: the sequence (the grid/mesh node dim) is blocked into
windows of ``window_size``; each block attends to itself and its neighbours
(banded attention), which XLA maps onto dense MXU matmuls -- the same
computation the reference delegates to flash-attention's sliding window.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from anemoi_tpu.models.layers.normalization import QKNorm, RMSNorm


def get_alibi_slopes(num_heads: int) -> jnp.ndarray:
    """ALiBi slopes per head (ref attention.py:545): powers of 2 descending."""

    def slopes_pow2(n):
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
        return [start * (start**i) for i in range(n)]

    if math.log2(num_heads).is_integer():
        s = slopes_pow2(num_heads)
    else:
        closest = 2 ** math.floor(math.log2(num_heads))
        s = slopes_pow2(closest)
        extra = slopes_pow2(2 * closest)[0::2][: num_heads - closest]
        s = s + extra
    return jnp.asarray(s, dtype=jnp.float32)


def _window_attention(
    q: jnp.ndarray,  # [B, N, H, D]
    k: jnp.ndarray,
    v: jnp.ndarray,
    window_size: Optional[int],
    softcap: Optional[float] = None,
    alibi_slopes: Optional[jnp.ndarray] = None,
    valid_len: Optional[int] = None,
) -> jnp.ndarray:
    """Banded (sliding-window) dense attention; full attention if window None.

    ``valid_len``: true sequence length when the input carries trailing pad
    rows (Ulysses sequence-parallel padding) -- pad keys are masked out and
    pad-query rows produce garbage that the caller slices away.  Masking uses
    a large finite negative (not -inf) so fully-masked rows keep softmax and
    its VJP NaN-free (0 * NaN would otherwise poison real d_k/d_v rows)."""
    b, n, h, d = q.shape
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, q.dtype))
    if valid_len is None:
        valid_len = n
    neg = jnp.asarray(-1e30, q.dtype)

    def apply_bias(logits, qpos, kpos):
        # logits [..., Lq, Lk]
        if softcap is not None and softcap > 0:
            logits = jnp.tanh(logits / softcap) * softcap
        if alibi_slopes is not None:
            dist = jnp.abs(qpos[:, None] - kpos[None, :]).astype(logits.dtype)
            logits = logits - alibi_slopes[:, None, None] * dist
        return logits

    if window_size is None or 2 * window_size + 1 >= n:
        logits = jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale
        pos = jnp.arange(n)
        logits = apply_bias(logits, pos, pos)
        if valid_len < n:
            kmask = pos < valid_len
            logits = jnp.where(kmask[None, None, None, :], logits, neg)
        alpha = jax.nn.softmax(logits, axis=-1)
        if valid_len < n:
            alpha = jnp.where(kmask[None, None, None, :], alpha, 0.0)
        return jnp.einsum("bhnm,bmhd->bnhd", alpha, v)

    # block-banded: window w -> block size w, attend to [prev, self, next]
    w = int(window_size)
    pad = (-n) % w
    if pad:
        zero = jnp.zeros((b, pad, h, d), q.dtype)
        q = jnp.concatenate([q, zero], axis=1)
        k = jnp.concatenate([k, zero], axis=1)
        v = jnp.concatenate([v, zero], axis=1)
    np_ = q.shape[1]
    nb = np_ // w
    qb = q.reshape(b, nb, w, h, d)

    def neighbourhood(x):
        xb = x.reshape(b, nb, w, h, d)
        prev = jnp.roll(xb, 1, axis=1)
        nxt = jnp.roll(xb, -1, axis=1)
        return jnp.concatenate([prev, xb, nxt], axis=2)  # [b, nb, 3w, h, d]

    kb = neighbourhood(k)
    vb = neighbourhood(v)
    logits = jnp.einsum("bnqhd,bnkhd->bhnqk", qb, kb) * scale  # [b,h,nb,w,3w]

    # mask: valid positions + |i-j| <= w + no wrap-around at the ends
    block = jnp.arange(nb)
    qpos = block[:, None] * w + jnp.arange(w)[None, :]  # [nb, w]
    koff = jnp.concatenate(
        [jnp.arange(-w, 0), jnp.arange(w), jnp.arange(w, 2 * w)]
    )  # local offsets relative to block start
    kpos = block[:, None] * w + koff[None, :]  # [nb, 3w] (can be <0 or >=np_)
    valid = (kpos >= 0) & (kpos < valid_len)
    dist_ok = jnp.abs(qpos[:, :, None] - kpos[:, None, :]) <= w
    mask = valid[:, None, :] & dist_ok  # [nb, w, 3w]

    if softcap is not None and softcap > 0:
        logits = jnp.tanh(logits / softcap) * softcap
    if alibi_slopes is not None:
        dist = jnp.abs(qpos[:, :, None] - kpos[:, None, :]).astype(logits.dtype)
        logits = logits - alibi_slopes[None, :, None, None, None] * dist[None, None]
    logits = jnp.where(mask[None, None], logits, neg)
    alpha = jax.nn.softmax(logits, axis=-1)
    alpha = jnp.where(mask[None, None], alpha, 0.0)
    out = jnp.einsum("bhnqk,bnkhd->bnqhd", alpha, vb)
    out = out.reshape(b, np_, h, d)
    return out[:, :n]


def apply_rotary_embeddings(q: jnp.ndarray, k: jnp.ndarray, base: float = 10000.0):
    """RoPE over the sequence axis (ref attention.py:381-399, which delegates
    to flash_attn's RotaryEmbedding(dim=head_dim), non-interleaved): rotate the
    two halves of each head dim by position-dependent angles.  q, k:
    [..., N, H, D] with positions along axis -3."""
    n, _, d = q.shape[-3:]
    half = d // 2
    inv = 1.0 / (base ** (jnp.arange(half, dtype=jnp.float32) / max(half, 1)))
    ang = jnp.arange(n, dtype=jnp.float32)[:, None] * inv[None]  # [N, half]
    cos = jnp.cos(ang)[:, None, :].astype(q.dtype)  # [N, 1, half]
    sin = jnp.sin(ang)[:, None, :].astype(q.dtype)

    def rot(x):
        x1, x2 = x[..., :half], x[..., half : 2 * half]
        out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
        if 2 * half < d:  # odd head dim: pass the last lane through
            out = jnp.concatenate([out, x[..., 2 * half :]], axis=-1)
        return out

    return rot(q), rot(k)


class MultiHeadSelfAttention(nn.Module):
    """MHSA over the node/sequence dim (ref attention.py:41-265)."""

    num_heads: int
    attn_channels: Optional[int] = None  # defaults to embed dim
    window_size: Optional[int] = None
    qkv_bias: bool = False
    qk_norm: bool = False
    qk_norm_type: str = "layernorm"
    softcap: Optional[float] = None
    use_alibi_slopes: bool = False
    use_rotary_embeddings: bool = False
    dropout_p: float = 0.0
    shard_strategy: str = "none"  # "heads" = Ulysses sequence parallelism
    valid_len: Optional[int] = None  # true node count before mesh padding
    attention_impl: str = "xla"  # "pallas" = fused flash banded kernel

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        b, n, c = x.shape
        hd = self.attn_channels or c
        h = self.num_heads
        assert hd % h == 0
        d = hd // h

        qkv = nn.Dense(3 * hd, use_bias=self.qkv_bias, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, n, h, d)
        k = k.reshape(b, n, h, d)
        v = v.reshape(b, n, h, d)
        if self.qk_norm:
            q = QKNorm(self.qk_norm_type, name="q_norm")(q)
            k = QKNorm(self.qk_norm_type, name="k_norm")(k)
        if self.use_rotary_embeddings:
            q, k = apply_rotary_embeddings(q, k)
        slopes = get_alibi_slopes(h) if self.use_alibi_slopes else None

        ulysses = False
        if self.shard_strategy == "heads":
            from anemoi_tpu.parallel.mesh import model_axis_size

            ulysses = model_axis_size() > 1
        if ulysses:
            from anemoi_tpu.parallel.heads import ulysses_mhsa

            out = ulysses_mhsa(
                q, k, v, self.window_size, self.softcap, slopes,
                valid_len=self.valid_len,
            )
        elif self.attention_impl == "pallas" and self.window_size is not None:
            from anemoi_tpu.ops.pallas.window_attention import (
                window_attention_pallas,
            )

            out = window_attention_pallas(
                q, k, v, self.window_size, self.softcap, slopes,
                valid_len=self.valid_len,
            )
        else:
            out = _window_attention(q, k, v, self.window_size, self.softcap, slopes)
        out = out.reshape(b, n, hd)
        return nn.Dense(c, name="out_proj")(out)


class MultiHeadCrossAttention(nn.Module):
    """Cross attention: queries from x_dst, keys/values from x_src
    (ref attention.py:523)."""

    num_heads: int
    attn_channels: Optional[int] = None
    qkv_bias: bool = False
    qk_norm: bool = False
    qk_norm_type: str = "layernorm"

    @nn.compact
    def __call__(self, x_src: jnp.ndarray, x_dst: jnp.ndarray) -> jnp.ndarray:
        b, nq, c = x_dst.shape
        nk = x_src.shape[1]
        hd = self.attn_channels or c
        h = self.num_heads
        d = hd // h
        q = nn.Dense(hd, use_bias=self.qkv_bias, name="q")(x_dst).reshape(b, nq, h, d)
        k = nn.Dense(hd, use_bias=self.qkv_bias, name="k")(x_src).reshape(b, nk, h, d)
        v = nn.Dense(hd, use_bias=self.qkv_bias, name="v")(x_src).reshape(b, nk, h, d)
        if self.qk_norm:
            q = QKNorm(self.qk_norm_type, name="q_norm")(q)
            k = QKNorm(self.qk_norm_type, name="k_norm")(k)
        scale = 1.0 / jnp.sqrt(jnp.asarray(d, q.dtype))
        logits = jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale
        alpha = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", alpha, v).reshape(b, nq, hd)
        return nn.Dense(c, name="out_proj")(out)

"""Fused (flash-style) sliding-window attention Pallas kernel.

The Transformer processor's banded attention
(models/layers/attention.py:_window_attention) materialises the logits and
alpha tensors [B, H, nb, w, 3w] in HBM -- at flagship transformer scale that
is the dominant HBM traffic of the layer.  This kernel computes one query
block's attention entirely in VMEM with an online softmax over the three
neighbouring key/value blocks, so only q/k/v/out ever touch HBM.

Semantics exactly match `_window_attention`'s block-banded scheme (window w =
block size w; query block i attends kv blocks {i-1, i, i+1} with
|qpos - kpos| <= w and kpos < valid_len), including the softcap and ALiBi
options and the large-finite mask (fully-masked rows stay NaN-free).

Backward: a `jax.custom_vjp` whose reverse pass differentiates the reference
XLA implementation (mathematically identical function); the forward-pass HBM
saving is where the win is, and the backward recompute reuses XLA's fused
kernels.  Equivalent of the reference's flash-attention usage in
models/layers/attention.py:208-237.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

try:  # keep this module importable where pallas is unavailable
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    PALLAS_AVAILABLE = True
except Exception:  # pragma: no cover
    PALLAS_AVAILABLE = False

NEG = -1e30


def _flash_band_kernel(
    q_ref,  # [1, w, D]
    k_ref,  # [1, w, D]   (kv block j of {i-1, i, i+1})
    v_ref,  # [1, w, D]
    out_ref,  # [1, w, D]
    lse_ref,  # [1, w]  log-sum-exp per query row
    acc_ref,  # VMEM [w, D] fp32
    m_ref,  # VMEM [w, 1] fp32 running max
    l_ref,  # VMEM [w, 1] fp32 running denom
    *,
    w: int,
    scale: float,
    softcap: Optional[float],
    valid_len: int,
    num_heads: int,
    alibi_slopes: Optional[tuple],
):
    bh = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG)
        l_ref[:] = jnp.zeros_like(l_ref)

    kb = i + j - 1  # kv block index (clamped in the index map; masked here)
    nb = pl.num_programs(1)
    in_range = jnp.logical_and(kb >= 0, kb < nb)

    @pl.when(in_range)
    def _step():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [w, w]
        if softcap is not None:
            logits = softcap * jnp.tanh(logits / softcap)
        qpos = i * w + jax.lax.broadcasted_iota(jnp.int32, (w, w), 0)
        kpos = kb * w + jax.lax.broadcasted_iota(jnp.int32, (w, w), 1)
        if alibi_slopes is not None:
            # per-head slope via a scalar select chain over the STATIC tuple
            # (no captured constant arrays, no dynamic vector indexing)
            h_id = jax.lax.rem(bh, num_heads)
            slope = jnp.float32(0.0)
            for idx, s_val in enumerate(alibi_slopes):
                slope = jnp.where(h_id == idx, jnp.float32(s_val), slope)
            logits = logits - slope * jnp.abs(qpos - kpos).astype(jnp.float32)
        mask = jnp.logical_and(
            jnp.abs(qpos - kpos) <= w, kpos < valid_len
        )
        logits = jnp.where(mask, logits, NEG)

        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(logits, axis=1, keepdims=True))
        p = jnp.exp(logits - m_new)  # [w, w]
        p = jnp.where(mask, p, 0.0)
        correction = jnp.exp(m_prev - m_new)  # [w, 1]
        l_ref[:] = l_ref[:] * correction + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[:] = acc_ref[:] * correction + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[:] = m_new

    @pl.when(j == 2)
    def _finalize():
        denom = jnp.maximum(l_ref[:], 1e-16)
        out_ref[0] = (acc_ref[:] / denom).astype(out_ref.dtype)
        # log-sum-exp per query row, for the flash backward.  Shaped
        # [bh, nb, w] with ONE [nb, w] block per bh (Mosaic requires the last
        # two block dims divisible by (8, 128) or equal to the array dims)
        lse_ref[0, i, :] = (m_ref[:] + jnp.log(denom))[:, 0]


def _flash_window_forward(
    q: jnp.ndarray,  # [BH, N, D]  (N a multiple of w)
    k: jnp.ndarray,
    v: jnp.ndarray,
    w: int,
    softcap: Optional[float],
    valid_len: int,
    num_heads: int,
    alibi_slopes: Optional[tuple],
    interpret: bool = False,
) -> jnp.ndarray:
    bh, n, d = q.shape
    nb = n // w
    scale = 1.0 / float(np.sqrt(d))
    kernel = functools.partial(
        _flash_band_kernel,
        w=w,
        scale=scale,
        softcap=softcap,
        valid_len=valid_len,
        num_heads=num_heads,
        alibi_slopes=alibi_slopes,
    )

    def kv_index(b, i, j):
        kb = jnp.clip(i + j - 1, 0, nb - 1)
        return (b, kb, 0)

    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((bh, n, d), q.dtype),
            jax.ShapeDtypeStruct((bh, nb, w), jnp.float32),
        ),
        grid=(bh, nb, 3),
        in_specs=[
            pl.BlockSpec((1, w, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, w, d), kv_index),
            pl.BlockSpec((1, w, d), kv_index),
        ],
        out_specs=(
            pl.BlockSpec((1, w, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, nb, w), lambda b, i, j: (b, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((w, d), jnp.float32),
            pltpu.VMEM((w, 1), jnp.float32),
            pltpu.VMEM((w, 1), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)


def _band_bias_mask(i_block, j_block, w, valid_len, num_heads, alibi_slopes, bh):
    """(bias, mask) for logits of q block ``i_block`` vs kv block ``j_block``."""
    qpos = i_block * w + jax.lax.broadcasted_iota(jnp.int32, (w, w), 0)
    kpos = j_block * w + jax.lax.broadcasted_iota(jnp.int32, (w, w), 1)
    mask = jnp.logical_and(jnp.abs(qpos - kpos) <= w, kpos < valid_len)
    bias = jnp.float32(0.0)
    if alibi_slopes is not None:
        h_id = jax.lax.rem(bh, num_heads)
        slope = jnp.float32(0.0)
        for idx, s_val in enumerate(alibi_slopes):
            slope = jnp.where(h_id == idx, jnp.float32(s_val), slope)
        bias = -slope * jnp.abs(qpos - kpos).astype(jnp.float32)
    return bias, mask


def _flash_bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, dq_acc,
    *, w, scale, valid_len, num_heads, alibi_slopes,
):
    """dq for query block i, accumulated over its three kv blocks."""
    bh = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    kb = i + j - 1
    in_range = jnp.logical_and(kb >= 0, kb < pl.num_programs(1))

    @pl.when(in_range)
    def _step():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0].astype(jnp.float32)
        lse = lse_ref[0, i, :][:, None]  # [w, 1]
        delta = delta_ref[0, i, :][:, None]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        bias, mask = _band_bias_mask(i, kb, w, valid_len, num_heads, alibi_slopes, bh)
        logits = logits + bias
        p = jnp.where(mask, jnp.exp(logits - lse), 0.0)
        dp = jax.lax.dot_general(
            do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta)
        dq_acc[:] += scale * jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(j == 2)
    def _finalize():
        dq_ref[0] = dq_acc[:].astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    k_ref, v_ref, q_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    dk_acc, dv_acc,
    *, w, scale, valid_len, num_heads, alibi_slopes,
):
    """dk/dv for kv block jb, accumulated over incoming q blocks
    {jb-1, jb, jb+1} (the band is symmetric)."""
    bh = pl.program_id(0)
    jb = pl.program_id(1)
    t = pl.program_id(2)

    @pl.when(t == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    ib = jb + t - 1
    in_range = jnp.logical_and(ib >= 0, ib < pl.num_programs(1))

    @pl.when(in_range)
    def _step():
        k = k_ref[0]
        v = v_ref[0]
        q = q_ref[0]
        do = do_ref[0].astype(jnp.float32)
        pos = jnp.clip(ib, 0, pl.num_programs(1) - 1)
        lse = lse_ref[0, pos, :][:, None]
        delta = delta_ref[0, pos, :][:, None]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        bias, mask = _band_bias_mask(ib, jb, w, valid_len, num_heads, alibi_slopes, bh)
        logits = logits + bias
        p = jnp.where(mask, jnp.exp(logits - lse), 0.0)  # [wq, wk]
        dv_acc[:] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta)
        dk_acc[:] += scale * jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(t == 2)
    def _finalize():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_window_backward(
    q, k, v, out, lse, g, w, valid_len, num_heads, alibi_slopes, interpret
):
    bh, n, d = q.shape
    nb = n // w
    scale = 1.0 / float(np.sqrt(d))
    # delta = rowsum(dO * O): cheap elementwise on the XLA side
    delta = jnp.sum(
        g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    ).reshape(bh, nb, w)

    common = dict(w=w, scale=scale, valid_len=valid_len, num_heads=num_heads,
                  alibi_slopes=alibi_slopes)

    def q_index(b, i, j):
        return (b, i, 0)

    def kv_index(b, i, j):
        return (b, jnp.clip(i + j - 1, 0, nb - 1), 0)

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, **common),
        out_shape=jax.ShapeDtypeStruct((bh, n, d), q.dtype),
        grid=(bh, nb, 3),
        in_specs=[
            pl.BlockSpec((1, w, d), q_index),
            pl.BlockSpec((1, w, d), kv_index),
            pl.BlockSpec((1, w, d), kv_index),
            pl.BlockSpec((1, w, d), q_index),
            pl.BlockSpec((1, nb, w), lambda b, i, j: (b, 0, 0)),
            pl.BlockSpec((1, nb, w), lambda b, i, j: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, w, d), q_index),
        scratch_shapes=[pltpu.VMEM((w, d), jnp.float32)],
        interpret=interpret,
    )(q, k, v, g, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, **common),
        out_shape=(
            jax.ShapeDtypeStruct((bh, n, d), k.dtype),
            jax.ShapeDtypeStruct((bh, n, d), v.dtype),
        ),
        grid=(bh, nb, 3),
        in_specs=[
            pl.BlockSpec((1, w, d), q_index),  # k block jb
            pl.BlockSpec((1, w, d), q_index),  # v block jb
            pl.BlockSpec((1, w, d), kv_index),  # q block jb+t-1
            pl.BlockSpec((1, w, d), kv_index),  # dO block jb+t-1
            pl.BlockSpec((1, nb, w), lambda b, i, j: (b, 0, 0)),  # lse
            pl.BlockSpec((1, nb, w), lambda b, i, j: (b, 0, 0)),  # delta
        ],
        out_specs=(
            pl.BlockSpec((1, w, d), q_index),
            pl.BlockSpec((1, w, d), q_index),
        ),
        scratch_shapes=[
            pltpu.VMEM((w, d), jnp.float32),
            pltpu.VMEM((w, d), jnp.float32),
        ],
        interpret=interpret,
    )(k, v, q, g, lse, delta)
    return dq, dk, dv


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8)
)
def _flash_window(q, k, v, w, softcap, valid_len, num_heads, alibi_slopes, interpret):
    out, _ = _flash_window_forward(
        q, k, v, w, softcap, valid_len, num_heads, alibi_slopes, interpret
    )
    return out


def _reference_window(q, k, v, w, softcap, valid_len, num_heads, alibi_slopes):
    """The XLA banded implementation on [BH, N, D] (for the backward)."""
    from anemoi_tpu.models.layers.attention import _window_attention

    bh, n, d = q.shape
    b = bh // num_heads
    def split(x):
        return jnp.transpose(x.reshape(b, num_heads, n, d), (0, 2, 1, 3))
    slopes = None if alibi_slopes is None else jnp.asarray(alibi_slopes, q.dtype)
    out = _window_attention(
        split(q), split(k), split(v), w, softcap, slopes, valid_len=valid_len
    )  # [B, N, H, D]
    return jnp.transpose(out, (0, 2, 1, 3)).reshape(bh, n, d)


def _fw_fwd(q, k, v, w, softcap, valid_len, num_heads, alibi_slopes, interpret):
    out, lse = _flash_window_forward(
        q, k, v, w, softcap, valid_len, num_heads, alibi_slopes, interpret
    )
    # policy-addressable names: with nn.remat(policy=save_only_these_names(
    # "flash_attn_out", "flash_attn_lse")) the backward reuses out/lse
    # instead of re-running the forward kernel (identity outside remat)
    from jax.ad_checkpoint import checkpoint_name

    out = checkpoint_name(out, "flash_attn_out")
    lse = checkpoint_name(lse, "flash_attn_lse")
    return out, (q, k, v, out, lse)


def _fw_bwd(w, softcap, valid_len, num_heads, alibi_slopes, interpret, res, g):
    q, k, v, out, lse = res
    if softcap is None:
        return _flash_window_backward(
            q, k, v, out, lse, g, w, valid_len, num_heads, alibi_slopes, interpret
        )
    # softcap saturates the logits through tanh; differentiate the XLA
    # reference for that (rare) configuration instead of a third kernel
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _reference_window(
            q_, k_, v_, w, softcap, valid_len, num_heads, alibi_slopes
        ),
        q, k, v,
    )
    return vjp(g)


_flash_window.defvjp(_fw_fwd, _fw_bwd)


def window_attention_pallas(
    q: jnp.ndarray,  # [B, N, H, D]
    k: jnp.ndarray,
    v: jnp.ndarray,
    window_size: int,
    softcap: Optional[float] = None,
    alibi_slopes: Optional[jnp.ndarray] = None,
    valid_len: Optional[int] = None,
) -> jnp.ndarray:
    """Drop-in fused replacement for `_window_attention` (banded case).

    Pads N up to a multiple of the window, reshapes to [B*H, N, D], runs the
    flash kernel, and restores the layout.  Falls back to the XLA path when
    Pallas is unavailable."""
    b, n, h, d = q.shape
    w = int(window_size)
    if not PALLAS_AVAILABLE:
        from anemoi_tpu.models.layers.attention import _window_attention

        return _window_attention(q, k, v, w, softcap, alibi_slopes, valid_len=valid_len)
    true_len = n if valid_len is None else int(valid_len)
    n_pad = -(-n // w) * w

    def to_bh(x):
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, n, d)
        if n_pad > n:
            x = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))
        return x

    slopes = (
        None
        if alibi_slopes is None
        else tuple(float(s) for s in np.asarray(alibi_slopes))
    )
    out = _flash_window(
        to_bh(q), to_bh(k), to_bh(v), w, softcap, min(true_len, n), h, slopes, False
    )
    out = out[:, :n].reshape(b, h, n, d)
    return jnp.transpose(out, (0, 2, 1, 3))
"""Measure the flash sliding-window Pallas kernel vs the XLA banded path on
the real TPU (forward and forward+backward), at Transformer-processor scale.

Usage: python tools/bench_window_attention.py [N] [D] [H] [W]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_tpu_cache")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10240
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    w = int(sys.argv[4]) if len(sys.argv) > 4 else 512
    b = 1
    dtype = jnp.bfloat16

    from anemoi_tpu.models.layers.attention import _window_attention
    from anemoi_tpu.ops.pallas.window_attention import window_attention_pallas

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, n, h, d)), dtype)
    k = jnp.asarray(rng.normal(size=(b, n, h, d)), dtype)
    v = jnp.asarray(rng.normal(size=(b, n, h, d)), dtype)

    def bench(fn, tag, steps=20):
        t0 = time.time()
        out = fn(q, k, v)
        jax.block_until_ready(out)
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(steps):
            out = fn(q, k, v)
        jax.block_until_ready(out)
        ms = (time.time() - t0) / steps * 1000
        print(f"{tag:24s} {ms:8.3f} ms   (compile {compile_s:.1f}s)", flush=True)
        return ms

    xla_fwd = jax.jit(lambda q, k, v: _window_attention(q, k, v, w))
    pls_fwd = jax.jit(lambda q, k, v: window_attention_pallas(q, k, v, w))

    def make_grad(fn):
        def loss(q, k, v):
            return jnp.sum(fn(q, k, v).astype(jnp.float32) ** 2)

        return jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

    out_x = xla_fwd(q, k, v)
    out_p = pls_fwd(q, k, v)
    err = float(
        jnp.max(jnp.abs(out_x.astype(jnp.float32) - out_p.astype(jnp.float32)))
    )
    print(f"max|xla - pallas| = {err:.2e}", flush=True)

    t_xf = bench(xla_fwd, "xla fwd")
    t_pf = bench(pls_fwd, "pallas fwd")
    t_xg = bench(make_grad(xla_fwd), "xla fwd+bwd")
    t_pg = bench(make_grad(pls_fwd), "pallas fwd+bwd")
    print(
        f"speedup: fwd {t_xf / t_pf:.2f}x, fwd+bwd {t_xg / t_pg:.2f}x",
        flush=True,
    )


if __name__ == "__main__":
    main()

"""Selective rematerialisation policies shared by processors and mappers.

The Pallas attention kernels tag their out/log-sum-exp with
`jax.ad_checkpoint.checkpoint_name` inside their custom-VJP fwd rules
(ops/pallas/{paged_gt,window_attention}.py).  A custom_vjp call is inlined
when it sits inside a remat region, so those names are visible to
`jax.checkpoint` policies: `save_only_these_names(out, lse)` makes the
backward reuse the saved kernel outputs instead of re-running the forward
kernel, while every cheap matmul/norm is still rematerialised.

Measured (one v5e-lite chip, bf16, paged backend, full->save_attention):
o160 896->680 ms, n320 1207->1046 ms, 1024ch 414->349 ms.

The reference's analogue is CheckpointWrapper granularity
(/root/reference/models/src/anemoi/models/layers/utils.py:55); selectivity
below the wrapper has no torch equivalent -- it is a jax.checkpoint policy.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn

# intermediates the Pallas attention kernels tag with jax checkpoint_name:
# out + log-sum-exp, the exact residuals their two-pass backward kernels read
ATTN_SAVE_NAMES = (
    "paged_attn_out",
    "paged_attn_lse",
    "flash_attn_out",
    "flash_attn_lse",
)


def resolve_remat_policy(name: Optional[str]):
    """Map a config string to a `jax.checkpoint` rematerialisation policy.

    - "full" / None: save nothing, recompute the whole block in backward
      (lowest memory; the forward attention kernel runs twice).
    - "save_attention": save only the attention kernels' out/lse (a few
      [N, HD] tensors per layer) so the backward never re-runs the forward
      kernel; every matmul/norm is still rematerialised.
    - "save_attention_mlp": save_attention + the [N, ratio*C] MLP hidden
      activation (tagged in layers/mlp.py) -- the backward replays neither
      the kernels nor the expansion matmul; one extra big tensor per layer.
    - "dots": XLA-level `dots_with_no_batch_dims_saveable` -- save matmul
      outputs, recompute elementwise only (highest memory short of no remat).
    """
    if name in (None, "full"):
        return None
    import jax

    if name == "save_attention":
        return jax.checkpoint_policies.save_only_these_names(*ATTN_SAVE_NAMES)
    if name == "save_attention_mlp":
        return jax.checkpoint_policies.save_only_these_names(
            *ATTN_SAVE_NAMES, "mlp_hidden"
        )
    if name == "dots":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    raise ValueError(
        f"unknown remat_policy {name!r}: "
        "expected full|save_attention|save_attention_mlp|dots"
    )


def remat(cls, policy_name: Optional[str]):
    """nn.remat with the named policy (prevent_cse off: scan bodies)."""
    return nn.remat(
        cls, static_argnums=(), prevent_cse=False,
        policy=resolve_remat_policy(policy_name),
    )

"""Layer-level parity against the REFERENCE's own torch modules.

The reference's GraphTransformerProcessorBlock
(/root/reference/models/src/anemoi/models/layers/block.py:1032) is executed
directly (pyg attention backend, no comm group) via the minimal stubs in
tests/reference_stubs.py; its state dict is ported onto the anemoi_tpu flax
block and the outputs must agree to fp32 precision.  This is the
activation-parity half of the reference's accuracy gate
(/root/reference/training/tests/integration/test_accuracy.py:15-50)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests import reference_stubs

reference_stubs.install()

from anemoi.models.layers.block import (  # noqa: E402  (reference code)
    GraphTransformerProcessorBlock as RefGTBlock,
)
from anemoi.models.distributed.shapes import GraphShardInfo  # noqa: E402

from anemoi_tpu.models.graph import SubGraphArrays  # noqa: E402
from anemoi_tpu.models.layers.graph_blocks import (  # noqa: E402
    GraphTransformerProcessorBlock,
)


def _random_graph(rng, n=48, deg=5):
    src = rng.integers(0, n, n * deg)
    dst = np.repeat(np.arange(n), deg)
    order = np.argsort(dst, kind="stable")
    ei = np.stack([src[order], dst[order]]).astype(np.int64)
    dst_ptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.bincount(ei[1], minlength=n), out=dst_ptr[1:])
    return ei, dst_ptr


def _port_block_params(state_dict, flax_params, conditional=False):
    """Reference block state-dict -> flax GraphTransformerProcessorBlock."""
    sd = {k: v.detach().numpy() for k, v in state_dict.items()}

    def lin(prefix):
        return {
            "kernel": sd[f"{prefix}.weight"].T,
            **({"bias": sd[f"{prefix}.bias"]} if f"{prefix}.bias" in sd else {}),
        }

    def ln(prefix):
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}

    out = {
        "layer_norm_attention": {"ln": ln("layer_norm_attention")},
        "lin_self": lin("lin_self"),
        "attention": {
            "lin_query": lin("lin_query"),
            "lin_key": lin("lin_key"),
            "lin_value": lin("lin_value"),
            "lin_edge": lin("lin_edge"),
            **(
                {
                    "q_norm": {"ln": {"scale": sd["q_norm.weight"]}},
                    "k_norm": {"ln": {"scale": sd["k_norm.weight"]}},
                }
                if "q_norm.weight" in sd
                else {}
            ),
        },
        "projection": lin("projection"),
        "layer_norm_mlp": {"ln": ln("layer_norm_mlp_dst")},
        "node_dst_mlp": {
            "ffn_in": {"linear": lin("node_dst_mlp.mlp.0")},
            "linear_out": lin("node_dst_mlp.mlp.2"),
        },
    }
    # keep any flax-side params the reference lacks (none expected)
    missing = set(flax_params["params"]) - set(out)
    assert not missing, f"unported flax params: {missing}"
    return {"params": out}


@pytest.mark.parametrize("qk_norm", [False, True])
def test_gt_processor_block_parity(rng, qk_norm):
    C, H, F = 32, 4, 6
    n = 48
    ei, dst_ptr = _random_graph(rng, n=n)
    x_np = rng.normal(size=(n, C)).astype(np.float32)
    e_np = rng.normal(size=(ei.shape[1], F)).astype(np.float32)

    torch.manual_seed(0)
    ref = RefGTBlock(
        in_channels=C,
        hidden_dim=2 * C,
        out_channels=C,
        num_heads=H,
        edge_dim=F,
        qk_norm=qk_norm,
        layer_kernels=reference_stubs.default_layer_kernels(),
        shard_strategy="heads",
        graph_attention_backend="pyg",
    )
    ref.eval()
    with torch.no_grad():
        out_ref, _ = ref(
            torch.from_numpy(x_np),
            torch.from_numpy(e_np),
            torch.from_numpy(ei),
            shard_info=GraphShardInfo(),
            batch_size=1,
            size=(n, n),
            model_comm_group=None,
        )

    sub = SubGraphArrays(
        edge_index=ei.astype(np.int32), edge_attr=e_np, dst_ptr=dst_ptr,
        num_src=n, num_dst=n,
    )
    edge_data = sub.edge_data(padded=True, bucketed=False)
    block = GraphTransformerProcessorBlock(
        num_heads=H, hidden_dim=2 * C, out_channels=C, qk_norm=qk_norm,
        backend="padded",
    )
    xb = jnp.asarray(x_np)[None]
    params0 = block.init(jax.random.PRNGKey(0), xb, edge_data)
    params = _port_block_params(ref.state_dict(), params0)
    # identical pytree structure (shapes must line up for the port to be real)
    jax.tree_util.tree_map(
        lambda a, b: None if a.shape == b.shape else (_ for _ in ()).throw(
            AssertionError(f"{a.shape} vs {b.shape}")
        ),
        params0, jax.tree_util.tree_map(jnp.asarray, params),
    )
    out_tpu, _ = block.apply(
        jax.tree_util.tree_map(jnp.asarray, params), xb, edge_data
    )
    np.testing.assert_allclose(
        np.asarray(out_tpu)[0], out_ref.numpy(), rtol=2e-4, atol=2e-5
    )

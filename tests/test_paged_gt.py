"""Fused paged GT-attention kernel parity (interpret mode on CPU; the same
kernel compiles through Mosaic on TPU — tools/bench_paged.py).

Mirrors the reference's Triton parity discipline
(/root/reference/models/tests/integration/triton/test_triton_gt.py): random
bipartite graphs, forward + backward allclose against the segment-op
reference semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from anemoi_tpu.ops.pallas import paged_gt
from anemoi_tpu.ops.pallas.paged_gt import (
    PALLAS_AVAILABLE,
    PagedTables,
    build_paged_csr,
    paged_gt_attention_flat,
)
from anemoi_tpu.ops.segment import graph_transformer_attention

pytestmark = pytest.mark.skipif(not PALLAS_AVAILABLE, reason="pallas unavailable")


@pytest.fixture(autouse=True)
def _interpret():
    paged_gt.set_interpret(True)
    yield
    paged_gt.set_interpret(False)


def random_bipartite(rng, num_src, num_dst, k_mean=5, empty_dst=(), dead_src=()):
    """Random dst-sorted bipartite edge_index with uneven degrees."""
    srcs, dsts = [], []
    alive = np.setdiff1d(np.arange(num_src), np.asarray(dead_src, dtype=int))
    for dd in range(num_dst):
        if dd in empty_dst:
            continue
        k = int(rng.integers(1, 2 * k_mean))
        srcs.append(rng.choice(alive, size=min(k, len(alive)), replace=False))
        dsts.append(np.full(len(srcs[-1]), dd))
    src = np.concatenate(srcs)
    dst = np.concatenate(dsts)
    o = np.lexsort((src, dst))
    return np.stack([src[o], dst[o]]).astype(np.int64)


def _paged(q, k, v, e, h, csr, stabilize=True):
    e_slots = jnp.asarray(csr.pad_edge_array(np.asarray(e)))
    tab = PagedTables.from_csr(csr)
    return paged_gt_attention_flat(q, k, v, e_slots, h, tab, stabilize), e_slots, tab


def _ref(q, k, v, e, h, edge_index, num_dst):
    n, hd = q.shape
    d = hd // h
    out = graph_transformer_attention(
        q.reshape(n, h, d),
        k.reshape(k.shape[0], h, d),
        v.reshape(v.shape[0], h, d),
        e.reshape(e.shape[0], h, d),
        jnp.asarray(edge_index),
        num_dst=num_dst,
    )
    return out.reshape(num_dst, hd)


@pytest.mark.parametrize("stabilize", [True, False])
def test_paged_forward_matches_segment(rng, stabilize):
    num_src, num_dst, h, d = 50, 37, 2, 8
    hd = h * d
    ei = random_bipartite(rng, num_src, num_dst, empty_dst=(7, 20))
    e_cnt = ei.shape[1]
    q = jnp.asarray(rng.normal(size=(num_dst, hd)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(num_src, hd)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(num_src, hd)), jnp.float32)
    e = jnp.asarray(rng.normal(size=(e_cnt, hd)), jnp.float32)

    csr = build_paged_csr(ei, num_src, num_dst, bd=8, page=16, r=8)
    out, _, _ = _paged(q, k, v, e, h, csr, stabilize)
    ref = _ref(q, k, v, e, h, ei, num_dst)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
    # destinations with no incoming edges produce zeros in both paths
    assert np.allclose(np.asarray(out)[7], 0.0)


def test_paged_gradients_match_segment(rng):
    num_src, num_dst, h, d = 40, 29, 2, 8
    hd = h * d
    # dead sources exercise the empty-page sentinel visits of the kv-reduce walk
    ei = random_bipartite(rng, num_src, num_dst, dead_src=(0, 1, 2, 3, 17))
    e_cnt = ei.shape[1]
    q = jnp.asarray(rng.normal(size=(num_dst, hd)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(num_src, hd)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(num_src, hd)), jnp.float32)
    e = np.asarray(rng.normal(size=(e_cnt, hd)), np.float32)
    w = jnp.asarray(rng.normal(size=(num_dst, hd)), jnp.float32)

    csr = build_paged_csr(ei, num_src, num_dst, bd=8, page=8, r=8)
    e_slots = jnp.asarray(csr.pad_edge_array(e))
    tab = PagedTables.from_csr(csr)

    def loss_paged(q, k, v, e_s):
        return jnp.sum(paged_gt_attention_flat(q, k, v, e_s, h, tab) * w)

    def loss_ref(q, k, v, e_d):
        return jnp.sum(_ref(q, k, v, e_d, h, ei, num_dst) * w)

    gp = jax.grad(loss_paged, argnums=(0, 1, 2, 3))(q, k, v, e_slots)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, jnp.asarray(e))
    for a, b, name in zip(gp[:3], gr[:3], "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-5, atol=3e-5,
            err_msg=f"d{name} mismatch",
        )
    # dead sources get exactly zero kv grads (sentinel-page writes)
    for s in (0, 1, 2, 3, 17):
        assert np.allclose(np.asarray(gp[1])[s], 0.0)
        assert np.allclose(np.asarray(gp[2])[s], 0.0)
    # edge grads ride in slot layout; map back through slot_pos
    d_e = np.asarray(gp[3])[csr.slot_pos]
    np.testing.assert_allclose(d_e, np.asarray(gr[3]), rtol=3e-5, atol=3e-5)


def test_paged_fused_bwd_matches_segment(rng):
    """fused_bwd tables: the kv-grad reduction recomputes attention per
    page-sorted visit (no [num_slots*r, 2HD] dkv buffer) -- grads must match
    the segment reference exactly like the two-pass backward does."""
    num_src, num_dst, h, d = 40, 29, 2, 8
    hd = h * d
    ei = random_bipartite(rng, num_src, num_dst, dead_src=(0, 1, 2, 3, 17))
    e_cnt = ei.shape[1]
    q = jnp.asarray(rng.normal(size=(num_dst, hd)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(num_src, hd)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(num_src, hd)), jnp.float32)
    e = np.asarray(rng.normal(size=(e_cnt, hd)), np.float32)
    w = jnp.asarray(rng.normal(size=(num_dst, hd)), jnp.float32)

    csr = build_paged_csr(ei, num_src, num_dst, bd=8, page=8, r=8)
    e_slots = jnp.asarray(csr.pad_edge_array(e))
    tab = PagedTables.from_csr(csr, fused_bwd=True)

    def loss_paged(q, k, v, e_s):
        return jnp.sum(paged_gt_attention_flat(q, k, v, e_s, h, tab) * w)

    def loss_ref(q, k, v, e_d):
        return jnp.sum(_ref(q, k, v, e_d, h, ei, num_dst) * w)

    gp = jax.grad(loss_paged, argnums=(0, 1, 2, 3))(q, k, v, e_slots)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, jnp.asarray(e))
    for a, b, name in zip(gp[:3], gr[:3], "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-5, atol=3e-5,
            err_msg=f"d{name} mismatch (fused_bwd)",
        )
    for s in (0, 1, 2, 3, 17):  # dead sources: sentinel-page zero writes
        assert np.allclose(np.asarray(gp[1])[s], 0.0)
        assert np.allclose(np.asarray(gp[2])[s], 0.0)
    d_e = np.asarray(gp[3])[csr.slot_pos]
    np.testing.assert_allclose(d_e, np.asarray(gr[3]), rtol=3e-5, atol=3e-5)


def test_paged_fused_bwd_multislot(rng):
    """fused_bwd with multi-slot (dst-block, page) pairs and partial blocks."""
    num_src, num_dst, h, d = 16, 8, 2, 8
    hd = h * d
    ei = random_bipartite(rng, num_src, num_dst, k_mean=7)
    csr = build_paged_csr(ei, num_src, num_dst, bd=8, page=16, r=4)
    q = jnp.asarray(rng.normal(size=(num_dst, hd)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(num_src, hd)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(num_src, hd)), jnp.float32)
    e = np.asarray(rng.normal(size=(ei.shape[1], hd)), np.float32)
    e_slots = jnp.asarray(csr.pad_edge_array(e))
    w = jnp.asarray(rng.normal(size=(num_dst, hd)), jnp.float32)

    def loss(tab):
        def f(q, k, v, e_s):
            return jnp.sum(paged_gt_attention_flat(q, k, v, e_s, h, tab) * w)
        return jax.grad(f, argnums=(0, 1, 2, 3))(q, k, v, e_slots)

    g_two = loss(PagedTables.from_csr(csr))
    g_fused = loss(PagedTables.from_csr(csr, fused_bwd=True))
    for a, b in zip(g_fused, g_two):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
        )


def test_paged_multislot_pairs(rng):
    """(dst-block, page) pairs larger than r split over several slots."""
    num_src, num_dst, h, d = 16, 8, 2, 8
    hd = h * d
    # dense-ish graph so single pairs exceed r=4
    ei = random_bipartite(rng, num_src, num_dst, k_mean=7)
    csr = build_paged_csr(ei, num_src, num_dst, bd=8, page=16, r=4)
    assert csr.num_slots > num_dst // 8  # multiple slots per block
    q = jnp.asarray(rng.normal(size=(num_dst, hd)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(num_src, hd)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(num_src, hd)), jnp.float32)
    e = jnp.asarray(rng.normal(size=(ei.shape[1], hd)), jnp.float32)
    out, _, _ = _paged(q, k, v, e, h, csr)
    ref = _ref(q, k, v, e, h, ei, num_dst)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_to_slot_layout_roundtrip_and_grad(rng):
    """Runtime slot-layout transform: gather fwd, gather bwd, no scatters."""
    from anemoi_tpu.ops.pallas.paged_gt import PagedTables, to_slot_layout

    num_src, num_dst = 20, 12
    ei = random_bipartite(rng, num_src, num_dst, k_mean=3)
    e_cnt = ei.shape[1]
    csr = build_paged_csr(ei, num_src, num_dst, bd=8, page=8, r=4)
    tab = PagedTables.from_csr(csr)
    x = jnp.asarray(rng.normal(size=(e_cnt, 5)), jnp.float32)

    slots = to_slot_layout(x, tab.slot_gather, tab.edge_slot)
    assert slots.shape == (csr.num_flat, 5)
    np.testing.assert_allclose(
        np.asarray(slots)[csr.slot_pos], np.asarray(x)
    )
    # padding rows are zero
    pad_mask = np.ones(csr.num_flat, bool)
    pad_mask[csr.slot_pos] = False
    assert np.allclose(np.asarray(slots)[pad_mask], 0.0)

    # grad: host scatter == custom gather backward
    w = jnp.asarray(rng.normal(size=slots.shape), jnp.float32)
    g = jax.grad(lambda x: jnp.sum(to_slot_layout(x, tab.slot_gather, tab.edge_slot) * w))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(w)[csr.slot_pos])
    # the VJP lowers to a gather, not a scatter
    txt = jax.jit(
        jax.grad(lambda x: jnp.sum(to_slot_layout(x, tab.slot_gather, tab.edge_slot) * w))
    ).lower(x).as_text()
    assert "scatter" not in txt


def test_attention_module_fused_bwd_grads_match(rng):
    """Model-level fused backward: GraphTransformerAttention grads with
    fused_bwd slot tables match the two-pass tables (the auto-heuristic path
    of encoder_processor_decoder.build_graph_inputs)."""
    from anemoi_tpu.models.graph import SubGraphArrays
    from anemoi_tpu.models.layers.graph_blocks import GraphTransformerAttention

    num_src, num_dst, h, hd = 24, 16, 2, 16
    ei = random_bipartite(rng, num_src, num_dst, k_mean=4).astype(np.int32)
    e_cnt = ei.shape[1]
    dst_ptr = np.searchsorted(ei[1], np.arange(num_dst + 1)).astype(np.int32)
    sub = SubGraphArrays(
        edge_index=ei,
        edge_attr=rng.normal(size=(e_cnt, 3)).astype(np.float32),
        dst_ptr=dst_ptr,
        num_src=num_src,
        num_dst=num_dst,
    )
    x_src = jnp.asarray(rng.normal(size=(2, num_src, 8)), jnp.float32)
    x_dst = jnp.asarray(rng.normal(size=(2, num_dst, 8)), jnp.float32)
    mod = GraphTransformerAttention(
        num_heads=h, attn_channels=hd, out_channels=hd, backend="paged"
    )

    def grads(fused):
        ed = sub.edge_data(paged=True, paged_block=(8, 8, 8),
                           paged_fused_bwd=fused)
        params = mod.init(jax.random.PRNGKey(0), x_src, x_dst, ed)

        def loss(p, xs, xd):
            return jnp.sum(mod.apply(p, xs, xd, ed) ** 2)

        return jax.grad(loss, argnums=(0, 1, 2))(params, x_src, x_dst)

    g_two = grads(False)
    g_fused = grads(True)
    for a, b in zip(jax.tree_util.tree_leaves(g_fused),
                    jax.tree_util.tree_leaves(g_two)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5
        )


def test_attention_module_paged_matches_padded(rng):
    """GraphTransformerAttention with backend='paged' (slot tables in
    EdgeData) matches the padded XLA path with identical params."""
    from anemoi_tpu.models.graph import SubGraphArrays
    from anemoi_tpu.models.layers.graph_blocks import GraphTransformerAttention

    num_src, num_dst, h, hd = 24, 16, 2, 16
    ei = random_bipartite(rng, num_src, num_dst, k_mean=4).astype(np.int32)
    e_cnt = ei.shape[1]
    dst_ptr = np.searchsorted(ei[1], np.arange(num_dst + 1)).astype(np.int32)
    sub = SubGraphArrays(
        edge_index=ei,
        edge_attr=rng.normal(size=(e_cnt, 3)).astype(np.float32),
        dst_ptr=dst_ptr,
        num_src=num_src,
        num_dst=num_dst,
    )
    ed = sub.edge_data(paged=True, paged_block=(8, 8, 8))
    assert ed.paged_tables is not None and ed.tables is not None

    x_src = jnp.asarray(rng.normal(size=(2, num_src, 8)), jnp.float32)
    x_dst = jnp.asarray(rng.normal(size=(2, num_dst, 8)), jnp.float32)

    def run(backend):
        mod = GraphTransformerAttention(
            num_heads=h, attn_channels=hd, out_channels=hd, backend=backend
        )
        params = mod.init(jax.random.PRNGKey(0), x_src, x_dst, ed)
        return mod.apply(params, x_src, x_dst, ed)

    out_paged = run("paged")
    out_padded = run("padded")
    np.testing.assert_allclose(
        np.asarray(out_paged), np.asarray(out_padded), rtol=3e-5, atol=3e-5
    )


def test_precomputed_edge_slots_match_runtime_gather(rng):
    """The build-time edge_attr_slots (static attrs pre-gathered into the
    kernel slot layout) must match the runtime to_slot_layout path exactly,
    values AND parameter grads; trainable edge widening must fall back."""
    from anemoi_tpu.models.graph import SubGraphArrays
    from anemoi_tpu.models.layers.graph_blocks import GraphTransformerAttention

    num_src, num_dst, h, hd = 24, 16, 2, 16
    ei = random_bipartite(rng, num_src, num_dst, k_mean=4).astype(np.int32)
    dst_ptr = np.searchsorted(ei[1], np.arange(num_dst + 1)).astype(np.int32)
    sub = SubGraphArrays(
        edge_index=ei,
        edge_attr=rng.normal(size=(ei.shape[1], 3)).astype(np.float32),
        dst_ptr=dst_ptr,
        num_src=num_src,
        num_dst=num_dst,
    )
    ed = sub.edge_data(paged=True, paged_block=(8, 8, 8))
    assert ed.edge_attr_slots is not None
    ed_stripped = ed.replace(edge_attr_slots=None)

    x_src = jnp.asarray(rng.normal(size=(1, num_src, 8)), jnp.float32)
    x_dst = jnp.asarray(rng.normal(size=(1, num_dst, 8)), jnp.float32)
    mod = GraphTransformerAttention(
        num_heads=h, attn_channels=hd, out_channels=hd, backend="paged"
    )
    params = mod.init(jax.random.PRNGKey(0), x_src, x_dst, ed)

    def loss(p, e):
        return jnp.sum(mod.apply(p, x_src, x_dst, e) ** 2)

    for a, b in zip(
        jax.tree_util.tree_leaves(
            (loss(params, ed), jax.grad(loss)(params, ed))
        ),
        jax.tree_util.tree_leaves(
            (loss(params, ed_stripped), jax.grad(loss)(params, ed_stripped))
        ),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    # width mismatch (e.g. TrainableEdgeFeatures appended) -> runtime gather
    ed_wide = ed.replace(
        edge_attr=jnp.concatenate(
            [ed.edge_attr, jnp.zeros((ed.edge_attr.shape[0], 1))], axis=-1
        )
    )
    params_w = mod.init(jax.random.PRNGKey(0), x_src, x_dst, ed_wide)
    out = mod.apply(params_w, x_src, x_dst, ed_wide)
    assert np.isfinite(np.asarray(out)).all()


def test_paged_large_logit_spread(rng):
    """The mean-shift online softmax stays exact for spread-out logits."""
    num_src, num_dst, h, d = 24, 16, 1, 8
    hd = h * d
    ei = random_bipartite(rng, num_src, num_dst, k_mean=4)
    q = jnp.asarray(rng.normal(size=(num_dst, hd)) * 6.0, jnp.float32)
    k = jnp.asarray(rng.normal(size=(num_src, hd)) * 6.0, jnp.float32)
    v = jnp.asarray(rng.normal(size=(num_src, hd)), jnp.float32)
    e = jnp.asarray(np.zeros((ei.shape[1], hd)), jnp.float32)
    csr = build_paged_csr(ei, num_src, num_dst, bd=8, page=8, r=8)
    out, _, _ = _paged(q, k, v, e, h, csr, stabilize=True)
    ref = _ref(q, k, v, e, h, ei, num_dst)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_remat_policy_skips_forward_kernel_recompute(rng):
    """`save_attention` remat policy: grads match full remat AND the forward
    kernel is not re-run inside the backward (its out/lse are saved through
    the checkpoint_name tags in _paged_fwd_impl)."""
    from anemoi_tpu.models.layers.processor import resolve_remat_policy

    num_src, num_dst, h, d = 24, 24, 2, 8
    hd = h * d
    ei = random_bipartite(rng, num_src, num_dst)
    csr = build_paged_csr(ei, num_src, num_dst, bd=8, page=8, r=8)
    tab = PagedTables.from_csr(csr)
    q = jnp.asarray(rng.normal(size=(num_dst, hd)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(num_src, hd)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(num_src, hd)), jnp.float32)
    e_s = jnp.asarray(csr.pad_edge_array(rng.normal(size=(ei.shape[1], hd)).astype(np.float32)))
    w = jnp.asarray(rng.normal(size=(num_dst, hd)), jnp.float32)

    def block(q, k, v, e_s):
        return jnp.tanh(paged_gt_attention_flat(q, k, v, e_s, h, tab))

    def mkloss(fn):
        return lambda q, k, v, e_s: jnp.sum(fn(q, k, v, e_s) * w)

    full = jax.checkpoint(block)
    sel = jax.checkpoint(block, policy=resolve_remat_policy("save_attention"))
    g_full = jax.grad(mkloss(full), argnums=(0, 1, 2, 3))(q, k, v, e_s)
    g_sel = jax.grad(mkloss(sel), argnums=(0, 1, 2, 3))(q, k, v, e_s)
    g_ref = jax.grad(mkloss(block), argnums=(0, 1, 2, 3))(q, k, v, e_s)
    for a, b, c in zip(g_full, g_sel, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(b), np.asarray(c), rtol=1e-6, atol=1e-6)

    # the forward kernel appears once less under the selective policy
    def count_pallas(jx):
        n = 0
        for eq in jx.eqns:
            if eq.primitive.name == "pallas_call":
                n += 1
            for v_ in eq.params.values():
                inner = getattr(v_, "jaxpr", None)
                if hasattr(v_, "eqns"):
                    n += count_pallas(v_)
                elif inner is not None and hasattr(inner, "eqns"):
                    n += count_pallas(inner)
        return n

    n_full = count_pallas(jax.make_jaxpr(jax.grad(mkloss(full)))(q, k, v, e_s).jaxpr)
    n_sel = count_pallas(jax.make_jaxpr(jax.grad(mkloss(sel)))(q, k, v, e_s).jaxpr)
    assert n_sel == n_full - 1, (n_sel, n_full)


@pytest.mark.parametrize("policy", ["full", "save_attention", "dots"])
def test_processor_remat_policy_grads_match(rng, policy):
    """GraphTransformerProcessor: per-layer remat with any policy produces the
    same grads as no checkpointing (paged backend, scan stack)."""
    from anemoi_tpu.models.graph import SubGraphArrays
    from anemoi_tpu.models.layers.processor import GraphTransformerProcessor

    num_nodes, h, c = 32, 2, 16
    ei = random_bipartite(rng, num_nodes, num_nodes, k_mean=4).astype(np.int32)
    dst_ptr = np.searchsorted(ei[1], np.arange(num_nodes + 1)).astype(np.int32)
    sub = SubGraphArrays(
        edge_index=ei,
        edge_attr=rng.normal(size=(ei.shape[1], 3)).astype(np.float32),
        dst_ptr=dst_ptr,
        num_src=num_nodes,
        num_dst=num_nodes,
    )
    ed = sub.edge_data(paged=True, paged_block=(8, 8, 8))
    x = jnp.asarray(rng.normal(size=(1, num_nodes, c)), jnp.float32)

    def grads(ckpt, pol):
        mod = GraphTransformerProcessor(
            num_layers=2, num_channels=c, num_heads=h, backend="paged",
            gradient_checkpointing=ckpt, remat_policy=pol,
        )
        params = mod.init(jax.random.PRNGKey(0), x, ed)
        loss = lambda p: jnp.sum(mod.apply(p, x, ed) ** 2)
        return jax.grad(loss)(params)

    g_ref = grads(False, None)
    g_pol = grads(True, policy)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5
        ),
        g_ref, g_pol,
    )


def test_mapper_remat_grads_match(rng):
    """GraphTransformer mappers with gradient_checkpointing (save_attention)
    produce the same grads as the unchecked mapper (paged backend)."""
    from anemoi_tpu.models.graph import SubGraphArrays
    from anemoi_tpu.models.layers.mapper import GraphTransformerForwardMapper

    num_src, num_dst, h, c = 24, 16, 2, 16
    ei = random_bipartite(rng, num_src, num_dst, k_mean=4).astype(np.int32)
    dst_ptr = np.searchsorted(ei[1], np.arange(num_dst + 1)).astype(np.int32)
    sub = SubGraphArrays(
        edge_index=ei,
        edge_attr=rng.normal(size=(ei.shape[1], 3)).astype(np.float32),
        dst_ptr=dst_ptr,
        num_src=num_src,
        num_dst=num_dst,
    )
    ed = sub.edge_data(paged=True, paged_block=(8, 8, 8))
    x = (
        jnp.asarray(rng.normal(size=(1, num_src, 5)), jnp.float32),
        jnp.asarray(rng.normal(size=(1, num_dst, 4)), jnp.float32),
    )

    def grads(ckpt):
        mod = GraphTransformerForwardMapper(
            hidden_dim=c, num_heads=h, backend="paged",
            gradient_checkpointing=ckpt,
        )
        params = mod.init(jax.random.PRNGKey(0), x, ed)
        loss = lambda p: jnp.sum(mod.apply(p, x, ed)[1] ** 2)
        return jax.grad(loss)(params)

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5
        ),
        grads(False), grads(True),
    )


@pytest.mark.parametrize("fused_bwd", [False, True])
def test_paged_fused_edge_projection(rng, fused_bwd):
    """Fused lin_edge projection (paged_gt_attention_flat_fe): forward and
    every gradient (q/k/v, raw edge features, projection weights incl. bias)
    match projecting outside the kernel."""
    from anemoi_tpu.ops.pallas.paged_gt import (
        augment_edge_weights,
        pad_raw_edge_features,
        paged_gt_attention_flat_fe,
    )

    num_src, num_dst, h, d, f = 40, 29, 2, 8, 3
    hd = h * d
    ei = random_bipartite(rng, num_src, num_dst, dead_src=(0, 1, 17))
    e_cnt = ei.shape[1]
    q = jnp.asarray(rng.normal(size=(num_dst, hd)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(num_src, hd)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(num_src, hd)), jnp.float32)
    raw = np.asarray(rng.normal(size=(e_cnt, f)), np.float32)
    w_lin = jnp.asarray(rng.normal(size=(f, hd)), jnp.float32) * 0.3
    b_lin = jnp.asarray(rng.normal(size=(hd,)), jnp.float32) * 0.1
    cot = jnp.asarray(rng.normal(size=(num_dst, hd)), jnp.float32)

    csr = build_paged_csr(ei, num_src, num_dst, bd=8, page=8, r=8)
    tab = PagedTables.from_csr(csr, fused_bwd=fused_bwd)
    raw_slots = jnp.asarray(csr.pad_edge_array(raw))
    raw_p = pad_raw_edge_features(raw_slots)
    fp = raw_p.shape[-1]

    def loss_fe(q, k, v, raw_p, w_lin, b_lin):
        w_aug = augment_edge_weights(w_lin, b_lin, fp)
        out = paged_gt_attention_flat_fe(q, k, v, raw_p, w_aug, h, tab)
        return jnp.sum(out * cot)

    def loss_ref(q, k, v, raw_d, w_lin, b_lin):
        e_d = raw_d @ w_lin + b_lin
        return jnp.sum(_ref(q, k, v, e_d, h, ei, num_dst) * cot)

    out_fe = paged_gt_attention_flat_fe(
        q, k, v, raw_p, augment_edge_weights(w_lin, b_lin, fp), h, tab
    )
    out_ref = _ref(q, k, v, jnp.asarray(raw) @ w_lin + b_lin, h, ei, num_dst)
    np.testing.assert_allclose(
        np.asarray(out_fe), np.asarray(out_ref), rtol=3e-5, atol=3e-5
    )

    gp = jax.grad(loss_fe, argnums=(0, 1, 2, 3, 4, 5))(
        q, k, v, raw_p, w_lin, b_lin
    )
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(
        q, k, v, jnp.asarray(raw), w_lin, b_lin
    )
    for a, b, name in zip(gp[:3], gr[:3], "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-5, atol=3e-5,
            err_msg=f"d{name} mismatch (fe, fused_bwd={fused_bwd})",
        )
    # raw-feature grads: slot layout back to edge order, first f lanes
    draw = np.asarray(gp[3])[csr.slot_pos][:, :f]
    np.testing.assert_allclose(draw, np.asarray(gr[3]), rtol=3e-5, atol=3e-5)
    # ones-lane grads sum to the bias grad; lin weights match
    np.testing.assert_allclose(
        np.asarray(gp[4]), np.asarray(gr[4]), rtol=3e-5, atol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(gp[5]), np.asarray(gr[5]), rtol=3e-5, atol=3e-5
    )


def test_attention_module_fused_edge_matches_unfused(rng):
    """GraphTransformerAttention with the fused edge projection (default on
    the paged path) matches the unfused path exactly: same params, same
    output, same grads."""
    import os

    from anemoi_tpu.models.graph import SubGraphArrays
    from anemoi_tpu.models.layers.graph_blocks import GraphTransformerAttention

    num_src, n_dst, h, hd = 24, 16, 2, 16
    ei = random_bipartite(rng, num_src, n_dst, k_mean=4).astype(np.int32)
    e_cnt = ei.shape[1]
    dst_ptr = np.searchsorted(ei[1], np.arange(n_dst + 1)).astype(np.int32)
    sub = SubGraphArrays(
        edge_index=ei,
        edge_attr=rng.normal(size=(e_cnt, 3)).astype(np.float32),
        dst_ptr=dst_ptr,
        num_src=num_src,
        num_dst=n_dst,
    )
    ed = sub.edge_data(paged=True, paged_block=(8, 8, 8))
    x_src = jnp.asarray(rng.normal(size=(1, num_src, hd)), jnp.float32)
    x_dst = jnp.asarray(rng.normal(size=(1, n_dst, hd)), jnp.float32)
    cot = jnp.asarray(rng.normal(size=(1, n_dst, hd)), jnp.float32)

    def run(fuse):
        os.environ["ANEMOI_PAGED_FUSE_EDGE"] = "1" if fuse else "0"
        try:
            mod = GraphTransformerAttention(
                num_heads=h, attn_channels=hd, out_channels=hd, backend="paged"
            )
            params = mod.init(jax.random.PRNGKey(0), x_src, x_dst, ed)

            def loss(p, xs, xd):
                return jnp.sum(mod.apply(p, xs, xd, ed) * cot)

            out = mod.apply(params, x_src, x_dst, ed)
            grads = jax.grad(loss, argnums=(0, 1, 2))(params, x_src, x_dst)
            return params, out, grads
        finally:
            os.environ.pop("ANEMOI_PAGED_FUSE_EDGE", None)

    p1, out1, g1 = run(True)
    p0, out0, g0 = run(False)
    # identical param trees (lin_edge kernel/bias names preserved)
    assert jax.tree_util.tree_structure(p1) == jax.tree_util.tree_structure(p0)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out0),
                               rtol=2e-5, atol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g0)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-5)

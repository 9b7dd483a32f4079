"""Property-based tests (hypothesis) for the pure algebraic layers.

The reference ships hypothesis in its models test extras and uses
property-style random inputs across its preprocessing/index suites; these
tests state the actual invariants and let hypothesis hunt the edges:

- normalizer: inverse o transform == identity for every method mix
- imputer: transform leaves no NaN; inverse restores the NaN mask
- IndexCollection: forcing/diagnostic/prognostic partition the variables
- ScaleTensor: scale() == product of broadcast scalers, any dim binding
- boundings: outputs honour the configured ranges, untouched vars pass through
- padded-CSR GT attention == segment reference on random graphs
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

import jax
import jax.numpy as jnp

from anemoi_tpu.data_indices.collection import IndexCollection

settings.register_profile("ci", max_examples=20, deadline=None)
settings.load_profile("ci")

METHODS = ["mean-std", "std", "min-max", "max", "none"]


def _names(n):
    return [f"v{i}" for i in range(n)]


@st.composite
def variable_split(draw, max_vars=8):
    n = draw(st.integers(2, max_vars))
    names = _names(n)
    forcing = draw(st.lists(st.sampled_from(names), unique=True, max_size=n - 1))
    rest = [v for v in names if v not in forcing]
    diagnostic = draw(
        st.lists(st.sampled_from(rest), unique=True, max_size=max(len(rest) - 1, 0))
    )
    return names, forcing, diagnostic


@given(variable_split())
def test_index_collection_partitions(split):
    names, forcing, diagnostic = split
    idx = IndexCollection(
        {v: i for i, v in enumerate(names)}, forcing=forcing, diagnostic=diagnostic
    )
    n = len(names)
    inp = set(np.asarray(idx.data.input.full).tolist())
    out = set(np.asarray(idx.data.output.full).tolist())
    prog = set(np.asarray(idx.data.input.prognostic).tolist())
    # forcing feeds the input only; diagnostics come out only
    forcing_ids = {names.index(v) for v in forcing}
    diag_ids = {names.index(v) for v in diagnostic}
    assert inp == set(range(n)) - diag_ids
    assert out == set(range(n)) - forcing_ids
    assert prog == set(range(n)) - forcing_ids - diag_ids
    # prognostic variables appear in both spaces at consistent positions
    assert prog == inp & out
    assert idx.num_data_vars == n


@given(
    variable_split(max_vars=6),
    st.lists(st.sampled_from(METHODS), min_size=6, max_size=6),
    st.integers(0, 2**31 - 1),
)
def test_normalizer_roundtrip(split, methods, seed):
    from anemoi_tpu.preprocessing.normalizer import InputNormalizer

    names, forcing, diagnostic = split
    n = len(names)
    idx = IndexCollection(
        {v: i for i, v in enumerate(names)}, forcing=forcing, diagnostic=diagnostic
    )
    rng = np.random.default_rng(seed)
    stats = {
        "mean": rng.normal(size=n),
        "stdev": rng.uniform(0.5, 3.0, size=n),
        "minimum": np.full(n, -4.0),
        "maximum": rng.uniform(1.0, 5.0, size=n),
    }
    norm = InputNormalizer(
        idx, stats, default="mean-std",
        methods={names[i]: m for i, m in enumerate(methods[:n])},
    )
    x = jnp.asarray(rng.normal(size=(2, 3, n)), jnp.float32)
    y = norm.transform(x)
    back = norm.inverse_transform(y, data_index=jnp.arange(n))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=2e-4, atol=2e-4)


@given(st.integers(0, 2**31 - 1), st.floats(-2.0, 2.0))
def test_imputer_fills_and_restores(seed, fill):
    from anemoi_tpu.preprocessing.imputer import ConstantImputer

    names = _names(4)
    idx = IndexCollection({v: i for i, v in enumerate(names)})
    rng = np.random.default_rng(seed)
    # canonical raw-batch layout [B, T, E, G, V]; NaN locations are static
    # per (grid, variable) like real missing observations (the imputer
    # records them from the first step, ref get_nans)
    x = rng.normal(size=(2, 3, 1, 5, 4)).astype(np.float32)
    nan_gv = rng.uniform(size=(2, 5, 4)) < 0.3
    x[:, :, :] = np.where(nan_gv[:, None, None], np.nan, x)
    imp = ConstantImputer(idx, default=float(fill))
    y = np.asarray(imp.transform(jnp.asarray(x)))
    assert not np.isnan(y).any()
    nan_mask = np.isnan(x)
    assert np.allclose(y[nan_mask], float(fill))
    assert np.allclose(y[~nan_mask], x[~nan_mask])
    # inverse restores NaN at the recorded input locations for imputed
    # output variables (ref imputer semantics: inference re-masking)
    aux = imp.compute_aux(jnp.asarray(x))
    out = rng.normal(size=(2, 1, 1, 5, 4)).astype(np.float32)
    restored = np.asarray(imp.inverse_transform(jnp.asarray(out), aux=aux))
    expect_nan = np.broadcast_to(nan_gv[:, None, None], restored.shape)
    assert np.isnan(restored[expect_nan]).all()
    assert np.allclose(restored[~expect_nan], out[~expect_nan])


@st.composite
def scaler_set(draw):
    # canonical loss layout [batch, time, ensemble, grid, variable]
    shape = (
        draw(st.integers(1, 2)), draw(st.integers(1, 3)), draw(st.integers(1, 2)),
        draw(st.integers(2, 5)), draw(st.integers(2, 6)),
    )
    dims_pool = [
        ("grid",), ("variable",), ("grid", "variable"), ("batch",),
        ("time",), ("ensemble",),
    ]
    n_scalers = draw(st.integers(1, 3))
    picks = draw(
        st.lists(st.sampled_from(dims_pool), min_size=n_scalers, max_size=n_scalers)
    )
    return shape, picks


@given(scaler_set(), st.integers(0, 2**31 - 1))
def test_scale_tensor_broadcast_product(cfg, seed):
    from anemoi_tpu.training.losses.base import DIMS, ScaleTensor

    shape, picks = cfg
    rng = np.random.default_rng(seed)
    st_obj = ScaleTensor()
    expected = np.ones(shape, dtype=np.float64)
    for i, dims in enumerate(picks):
        arr = rng.uniform(0.5, 2.0, size=tuple(shape[DIMS[d]] for d in dims)).astype(
            np.float32
        )
        st_obj = st_obj.add_scaler(dims, jnp.asarray(arr), name=f"s{i}")
        reshape = [1] * len(shape)
        for d, s in zip(dims, arr.shape):
            reshape[DIMS[d]] = s
        expected = expected * arr.reshape(reshape)
    x = rng.normal(size=shape).astype(np.float32)
    got = np.asarray(st_obj.scale(jnp.asarray(x)))
    np.testing.assert_allclose(got, x * expected, rtol=2e-5, atol=2e-5)


@given(
    st.integers(0, 2**31 - 1),
    st.floats(-1.0, 0.0),
    st.floats(0.5, 2.0),
)
def test_bounding_ranges(seed, min_val, max_val):
    from anemoi_tpu.models.layers.bounding import build_boundings

    names = _names(5)
    n2i = {v: i for i, v in enumerate(names)}
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(3, 7, 5)) * 4.0, jnp.float32)
    bounds = build_boundings(
        [
            {"name": "relu", "variables": ["v0"]},
            {"name": "hardtanh", "variables": ["v1"],
             "min_val": float(min_val), "max_val": float(max_val)},
            {"name": "fraction", "variables": ["v2"], "min_val": 0.0,
             "max_val": 1.0, "total_var": "v3"},
        ],
        n2i,
    )
    y = x
    for b in bounds:
        y = b(y)
    y = np.asarray(y)
    xn = np.asarray(x)
    assert (y[..., 0] >= 0).all()
    assert (y[..., 1] >= min_val - 1e-6).all() and (y[..., 1] <= max_val + 1e-6).all()
    # fraction: clamp then scale by v3 (v3 itself untouched)
    frac = np.clip(xn[..., 2], 0.0, 1.0) * xn[..., 3]
    np.testing.assert_allclose(y[..., 2], frac, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(y[..., 3], xn[..., 3])
    np.testing.assert_allclose(y[..., 4], xn[..., 4])


@st.composite
def bipartite(draw):
    num_src = draw(st.integers(3, 24))
    num_dst = draw(st.integers(2, 16))
    # at least one edge per some dsts; degrees vary, some dsts empty
    edges = []
    for dst in range(num_dst):
        k = draw(st.integers(0, min(5, num_src)))
        srcs = draw(
            st.lists(st.integers(0, num_src - 1), min_size=k, max_size=k, unique=True)
        )
        edges += [(s, dst) for s in srcs]
    if not edges:
        edges = [(0, 0)]
    arr = np.asarray(edges, dtype=np.int64).T
    o = np.lexsort((arr[0], arr[1]))
    return arr[:, o], num_src, num_dst


@given(bipartite(), st.integers(0, 2**31 - 1))
@settings(max_examples=10, deadline=None)
def test_padded_matches_segment_property(graph, seed):
    from anemoi_tpu.ops.padded import PaddedCSR, padded_gt_attention_csr
    from anemoi_tpu.ops.segment import graph_transformer_attention

    ei, num_src, num_dst = graph
    h, d = 2, 4
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(num_dst, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(num_src, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(num_src, h, d)), jnp.float32)
    e = jnp.asarray(rng.normal(size=(ei.shape[1], h, d)), jnp.float32)
    dst_ptr = np.searchsorted(ei[1], np.arange(num_dst + 1))
    csr = PaddedCSR.from_edge_index(
        ei.astype(np.int32), dst_ptr.astype(np.int32), num_src=num_src
    )
    out_p = padded_gt_attention_csr(q, k, v, e, csr)
    out_s = graph_transformer_attention(q, k, v, e, jnp.asarray(ei), num_dst=num_dst)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_s), rtol=2e-5, atol=2e-5
    )

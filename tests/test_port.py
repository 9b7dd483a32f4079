"""Weight-porting round trip: flax -> reference-style names -> flax."""

import numpy as np
import pytest

import jax

from anemoi_tpu.models.port import flax_to_reference, reference_to_flax


@pytest.fixture(scope="module")
def gt_params(tiny_graph):
    from tests.test_models import build_interface

    iface = build_interface(
        tiny_graph,
        processor="GraphTransformerProcessor",
        encoder="GraphTransformerForwardMapper",
        decoder="GraphTransformerBackwardMapper",
    )
    return iface.init_params(jax.random.PRNGKey(3))


def test_roundtrip_identity(gt_params):
    sd = flax_to_reference(gt_params)
    # names look like reference names
    assert any(k.startswith("model.encoder.data.proc.") for k in sd)
    assert any(".lin_query.weight" in k for k in sd)
    assert any("model.processor.proc.0." in k for k in sd)
    assert any("model.processor.proc.1." in k for k in sd)  # scan split per layer
    assert any("node_data_extractor.1.weight" in k for k in sd)
    # torch layout: Linear weights are [out, in]
    restored = reference_to_flax(sd, gt_params)
    a = jax.tree_util.tree_leaves(gt_params)
    b = jax.tree_util.tree_leaves(restored)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_missing_params_raise(gt_params):
    sd = flax_to_reference(gt_params)
    key = next(iter(sd))
    del sd[key]
    with pytest.raises(KeyError):
        reference_to_flax(sd, gt_params)

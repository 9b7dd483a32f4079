import numpy as np
import pytest

from anemoi_tpu.data_indices import IndexCollection

NAME_TO_INDEX = {"q": 0, "t": 1, "u": 2, "z": 3, "tp": 4, "cos_lat": 5}


@pytest.fixture
def coll():
    return IndexCollection(
        NAME_TO_INDEX, forcing=["cos_lat", "z"], diagnostic=["tp"]
    )


def test_prognostic_inference(coll):
    assert coll.prognostic == ["q", "t", "u"]


def test_data_space(coll):
    # data input: forcing + prognostic = q,t,u,z,cos_lat (data-order indices)
    np.testing.assert_array_equal(coll.data.input.full, [0, 1, 2, 3, 5])
    np.testing.assert_array_equal(coll.data.input.forcing, [3, 5])
    np.testing.assert_array_equal(coll.data.input.prognostic, [0, 1, 2])
    # data output: diagnostic + prognostic
    np.testing.assert_array_equal(coll.data.output.full, [0, 1, 2, 4])
    np.testing.assert_array_equal(coll.data.output.diagnostic, [4])


def test_model_space(coll):
    # model input packs forcing+prognostic in data order: q,t,u,z,cos_lat -> 0..4
    assert coll.num_model_input_vars == 5
    np.testing.assert_array_equal(coll.model.input.prognostic, [0, 1, 2])
    np.testing.assert_array_equal(coll.model.input.forcing, [3, 4])
    # model output packs prognostic+diagnostic: q,t,u,tp -> 0..3
    assert coll.num_model_output_vars == 4
    np.testing.assert_array_equal(coll.model.output.prognostic, [0, 1, 2])
    np.testing.assert_array_equal(coll.model.output.diagnostic, [3])


def test_overlap_assertion():
    with pytest.raises(AssertionError):
        IndexCollection(NAME_TO_INDEX, forcing=["z"], diagnostic=["z"])


def test_equality(coll):
    other = IndexCollection(NAME_TO_INDEX, forcing=["cos_lat", "z"], diagnostic=["tp"])
    assert coll == other
    different = IndexCollection(NAME_TO_INDEX, forcing=["cos_lat"], diagnostic=["tp"])
    assert coll != different


def test_target_variables():
    coll = IndexCollection(NAME_TO_INDEX, forcing=["cos_lat"], diagnostic=["tp"], target=["z"])
    # target appears in data output but not model output
    assert "z" in coll.data.output.ordered_names
    assert "z" not in coll.model.output.ordered_names
    assert coll.prognostic == ["q", "t", "u"]

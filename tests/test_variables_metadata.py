"""Variable-group/level extraction + metadata compat checks
(ref training/utils/variables_metadata.py)."""

import numpy as np
import pytest

from anemoi_tpu.data_indices import IndexCollection
from anemoi_tpu.training.losses.scalers import create_scalers
from anemoi_tpu.utils.variables_metadata import (
    ExtractVariableGroupAndLevel,
    VariableMetadata,
    check_loss_variable_units_compatibility,
    check_variables_metadata_compatibility,
    crack_variable_name,
    extract_variables_metadata_from_checkpoint,
)


def test_crack_variable_name():
    assert crack_variable_name("q_850") == ("q", 850)
    assert crack_variable_name("10u") == ("10u", None)
    assert crack_variable_name("z_surface") == ("z_surface", None)
    assert crack_variable_name("abc_1_2") == ("abc_1", 2)


def test_simple_groups_from_name_cracking():
    ex = ExtractVariableGroupAndLevel({"default": "sfc", "pl": ["q", "t", "u", "v", "z"]})
    assert ex.get_group_and_level("t_850") == ("pl", "t", 850)
    assert ex.get_group_and_level("q_50") == ("pl", "q", 50)
    assert ex.get_group_and_level("2t") == ("sfc", "2t", None)
    assert ex.get_group_specification("pl") == ["q", "t", "u", "v", "z"]


def test_groups_prefer_trusted_metadata():
    # metadata says tp is an accumulated surface field whose cracked name
    # would otherwise look levelled
    meta = {
        "tp_6": {"mars": {"param": "tp", "levtype": "sfc"}},
        "t_850": {"mars": {"param": "t", "levtype": "pl", "levelist": 850}},
    }
    ex = ExtractVariableGroupAndLevel({"default": "sfc", "pl": ["t"]}, meta)
    # tp_6 metadata is surface with no level -> trusted -> param "tp", no level
    assert ex.get_group_and_level("tp_6") == ("sfc", "tp", None)
    assert ex.get_group_and_level("t_850") == ("pl", "t", 850)


def test_complex_group_spec_matches_metadata():
    meta = {"swh": {"mars": {"param": "swh", "levtype": "o2d"}}}
    ex = ExtractVariableGroupAndLevel({"default": "sfc", "ocean": {"levtype": "o2d"}}, meta)
    assert ex.get_group("swh") == "ocean"
    # complex spec without metadata for the variable must be {'param': ...}
    ex2 = ExtractVariableGroupAndLevel({"default": "sfc", "ocean": {"levtype": "o2d"}})
    with pytest.raises(ValueError):
        ex2.get_group("swh")
    ex3 = ExtractVariableGroupAndLevel({"default": "sfc", "hum": {"param": ["q"]}})
    assert ex3.get_group("q_700") == "hum"


def test_metadata_compat_check_units():
    ckpt = {"era": {"2t": {"units": "K"}, "msl": {"units": "Pa"}}}
    ok_ds = {"era": {"variables_metadata": {"2t": {"units": "K"}, "msl": {"units": "Pa"}}}}
    check_variables_metadata_compatibility(ckpt, ok_ds)  # no raise
    bad_ds = {"era": {"variables_metadata": {"2t": {"units": "degC"}}}}
    with pytest.raises(ValueError, match="units differ"):
        check_variables_metadata_compatibility(ckpt, bad_ds)
    # absent metadata on either side: warn + skip, never raise
    check_variables_metadata_compatibility(None, ok_ds)
    check_variables_metadata_compatibility(ckpt, {"era": {}})
    check_variables_metadata_compatibility(ckpt, ok_ds, ignore_units=True)


def test_loss_variable_units_compat():
    vm = {"tp": {"units": "m"}, "imerg": {"units": "m"}, "2t": {"units": "K"}}
    check_loss_variable_units_compatibility(["tp"], ["imerg"], vm)
    with pytest.raises(ValueError, match="not compatible"):
        check_loss_variable_units_compatibility(["tp"], ["2t"], vm)
    check_loss_variable_units_compatibility(["tp"], ["2t"], None)  # skip


def test_extract_from_checkpoint_metadata():
    md = {"dataset": {"era": {"variables_metadata": {"2t": {"units": "K"}}}, "other": {}}}
    out = extract_variables_metadata_from_checkpoint(md, ["era", "other"])
    assert out == {"era": {"2t": {"units": "K"}}}
    assert extract_variables_metadata_from_checkpoint({}, ["era"]) is None


def test_variable_metadata_properties():
    v = VariableMetadata.from_dict("t_850", {"mars": {"param": "t", "levtype": "pl", "levelist": "850"}})
    assert v.param == "t" and v.level == 850 and not v.is_surface_level
    s = VariableMetadata.from_dict("2t", {"units": "K"})
    assert s.param == "2t" and s.level is None and s.is_surface_level


# ---------------------------------------------------------------------------
# scalers that consume the extractor
# ---------------------------------------------------------------------------


def _indices():
    names = {"q_850": 0, "t_850": 1, "t_500": 2, "2t": 3, "cos_lat": 4}
    return IndexCollection(names, forcing=["cos_lat"])


def test_group_filtered_level_scaler():
    idx = _indices()
    scalers = create_scalers(
        {"pl": {"name": "ReluVariableLevelScaler", "group": "pl",
                "slope": 0.001, "y_intercept": 0.2}},
        data_indices=idx,
        variable_groups={"default": "sfc", "pl": ["t"]},
    )
    names = idx.model.output.ordered_names
    w = scalers["pl"][1]
    # only group 'pl' (parameter t) is scaled; q_850 keeps weight 1
    np.testing.assert_allclose(w[names.index("t_850")], 0.85, atol=1e-6)
    np.testing.assert_allclose(w[names.index("t_500")], 0.5, atol=1e-6)
    np.testing.assert_allclose(w[names.index("q_850")], 1.0)
    np.testing.assert_allclose(w[names.index("2t")], 1.0)


def test_no_variable_level_scaler_is_constant():
    idx = _indices()
    scalers = create_scalers(
        {"none": {"name": "NoVariableLevelScaler", "group": "pl"}},
        data_indices=idx,
        variable_groups={"default": "sfc", "pl": ["t", "q"]},
    )
    np.testing.assert_allclose(scalers["none"][1], 1.0)


def test_variable_masking_scaler():
    idx = _indices()
    scalers = create_scalers(
        {"mask": {"name": "VariableMaskingLossScaler", "variables": ["t"]},
         "only": {"name": "VariableMaskingLossScaler", "variables": ["t_850"],
                  "invert": True}},
        data_indices=idx,
    )
    names = idx.model.output.ordered_names
    w = scalers["mask"][1]
    assert w[names.index("t_850")] == 0 and w[names.index("t_500")] == 0
    assert w[names.index("q_850")] == 1 and w[names.index("2t")] == 1
    w2 = scalers["only"][1]
    assert w2[names.index("t_850")] == 1
    assert w2[names.index("q_850")] == 0 and w2[names.index("t_500")] == 0


def test_spectral_dimension_scaler():
    scalers = create_scalers(
        {"spec": {"name": "SpectralDimensionScaler", "n_spectral_modes": 32,
                  "spectral_dims": 64}},
    )
    dims, w = scalers["spec"]
    assert dims == ("grid",) and w.shape == (64,)
    np.testing.assert_allclose(w, 1.0 / 32.0)


def test_time_step_scaler_family():
    scalers = create_scalers(
        {
            "uniform": {"name": "UniformTimeStepScaler", "n_steps": 4},
            "decay": {"name": "LeadTimeDecayScaler",
                      "output_lead_times": [1, 2, 3], "decay_factor": 0.5,
                      "max_lead_time": 3, "decay_type": "linear"},
            "grow": {"name": "LeadTimeDecayScaler",
                     "output_lead_times": [1, 2, 3], "decay_factor": 0.5,
                     "max_lead_time": 3, "decay_type": "exponential",
                     "inverse": True},
            "explicit": {"name": "TimeStepScaler", "weights": [1.0, 0.5]},
        },
    )
    np.testing.assert_allclose(scalers["uniform"][1], 0.25)
    w = scalers["decay"][1]
    assert w[0] > w[1] > w[2] and abs(w.sum() - 1) < 1e-6  # decaying, unit-sum
    g = scalers["grow"][1]
    assert g[0] < g[1] < g[2] and abs(g.sum() - 1) < 1e-6
    np.testing.assert_allclose(scalers["explicit"][1], [1.0, 0.5])


def test_tendency_scaler_variants():
    idx = _indices()
    stats = {"stdev": np.array([2.0, 4.0, 4.0, 1.0, 1.0])}
    tend = {"stdev": np.array([1.0, 2.0, 2.0, 0.5, 1.0])}
    built = create_scalers(
        {
            "stdev": {"name": "StdevTendencyScaler"},
            "var": {"name": "VarTendencyScaler"},
            "no": {"name": "NoTendencyScaler"},
        },
        data_indices=idx,
        statistics=stats,
        statistics_tendencies=tend,
    )
    names = idx.model.output.ordered_names
    i = names.index("q_850")  # data index 0: 2.0 / 1.0
    np.testing.assert_allclose(built["stdev"][1][i], 2.0)
    np.testing.assert_allclose(built["var"][1][i], 4.0)
    np.testing.assert_allclose(built["no"][1], 1.0)


def test_reweighted_node_attribute_scaler(tiny_graph):
    nodes = tiny_graph["data"]
    n = nodes.num_nodes
    mask = np.zeros(n, dtype=bool)
    mask[: n // 2] = True
    nodes.attributes["interior"] = mask
    built = create_scalers(
        {"w": {"name": "ReweightedGraphNodeAttributeScaler",
               "nodes_name": "data", "attribute_name": "area_weight",
               "scaling_mask_attribute_name": "interior",
               "weight_frac_of_total": 0.75, "norm": None}},
        graph=tiny_graph,
    )
    w = built["w"][1]
    frac = w[mask].sum() / w.sum()
    np.testing.assert_allclose(frac, 0.75, rtol=1e-5)
    with pytest.raises(KeyError, match="available boolean"):
        create_scalers(
            {"w": {"name": "ReweightedGraphNodeAttributeScaler",
                   "nodes_name": "data", "attribute_name": "area_weight",
                   "scaling_mask_attribute_name": "nope",
                   "weight_frac_of_total": 0.5}},
            graph=tiny_graph,
        )

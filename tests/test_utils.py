import os

import pytest

from anemoi_tpu.utils.config import DotDict, apply_overrides, load_config
from anemoi_tpu.utils.registry import Registry
from anemoi_tpu.utils.seeding import context_seed, get_base_seed


def test_registry_roundtrip():
    reg = Registry("widget")

    @reg.register("foo")
    def make_foo(x=1):
        return ("foo", x)

    assert reg.build("foo", x=3) == ("foo", 3)
    assert reg.build_from_config({"name": "foo", "x": 5}) == ("foo", 5)
    with pytest.raises(KeyError):
        reg.get("bar")


def test_dotdict():
    d = DotDict({"a": {"b": 1}, "c": [{"d": 2}]})
    assert d.a.b == 1
    assert d.c[0].d == 2
    d.a.e = {"f": 3}
    assert d.a.e.f == 3
    assert d.to_dict() == {"a": {"b": 1, "e": {"f": 3}}, "c": [{"d": 2}]}


def test_overrides():
    cfg = {"model": {"num_channels": 64}}
    apply_overrides(cfg, ["model.num_channels=128", "training.lr=1e-3", "flag=true"])
    assert cfg["model"]["num_channels"] == 128
    assert cfg["training"]["lr"] == 1e-3
    assert cfg["flag"] is True


def test_load_config_defaults(tmp_path):
    (tmp_path / "model").mkdir()
    (tmp_path / "model" / "small.yaml").write_text("num_channels: 32\nlayers: 2\n")
    (tmp_path / "main.yaml").write_text(
        "defaults:\n  - model: small\nmodel:\n  layers: 4\nrun: test\n"
    )
    cfg = load_config(str(tmp_path / "main.yaml"))
    assert cfg.model.num_channels == 32
    assert cfg.model.layers == 4  # file's own keys override defaults
    assert cfg.run == "test"


def test_seeding_deterministic(monkeypatch):
    monkeypatch.delenv("ANEMOI_BASE_SEED", raising=False)
    assert get_base_seed() == 42
    monkeypatch.setenv("ANEMOI_BASE_SEED", "7")
    assert get_base_seed() == 7000  # upscaled like the reference
    a = context_seed("model-init")
    b = context_seed("model-init")
    c = context_seed("data-shuffle")
    assert a == b != c


def test_gather_provenance_info():
    """Provenance snapshot (ref train.py:513): versions, git, platform."""
    from anemoi_tpu.utils.provenance import gather_provenance_info

    info = gather_provenance_info()
    assert info["python"] and info["platform"]
    assert info["packages"]["jax"] != "not-installed"
    assert info["packages"]["numpy"] != "not-installed"
    # this repo is a git checkout
    assert "git" in info and len(info["git"]["commit"]) == 40
    full = gather_provenance_info(full_pip=True)
    assert len(full["pip_freeze"]) > 20

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import serialization

from anemoi_tpu.models.migrations import Migrator
from anemoi_tpu.training.checkpoint_pipeline import (
    CheckpointContext,
    CheckpointPipeline,
)


@pytest.fixture
def saved_params(tmp_path, rng):
    params = {
        "params": {
            "encoder": {"kernel": rng.normal(size=(4, 8)).astype(np.float32)},
            "decoder": {"kernel": rng.normal(size=(8, 3)).astype(np.float32)},
        }
    }
    path = str(tmp_path / "params.msgpack")
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))
    return params, path


def fresh_like(params, fill=0.0):
    return jax.tree_util.tree_map(lambda x: np.full_like(x, fill), params)


def test_weights_only(saved_params):
    params, path = saved_params
    pipe = CheckpointPipeline([
        {"stage": "source", "name": "local", "path": path},
        {"stage": "loading", "name": "weights_only"},
    ])
    ctx = pipe.run(CheckpointContext(params=fresh_like(params)))
    np.testing.assert_array_equal(
        ctx.params["params"]["encoder"]["kernel"], params["params"]["encoder"]["kernel"]
    )


def test_transfer_learning_partial(saved_params, rng):
    params, path = saved_params
    # target has a different decoder shape + an extra module
    target = {
        "params": {
            "encoder": {"kernel": np.zeros((4, 8), np.float32)},
            "decoder": {"kernel": np.zeros((8, 5), np.float32)},  # mismatch
            "new_head": {"kernel": np.ones((2, 2), np.float32)},
        }
    }
    pipe = CheckpointPipeline([
        {"stage": "source", "name": "local", "path": path},
        {"stage": "loading", "name": "transfer_learning"},
    ])
    ctx = pipe.run(CheckpointContext(params=target))
    np.testing.assert_array_equal(
        ctx.params["params"]["encoder"]["kernel"], params["params"]["encoder"]["kernel"]
    )
    # mismatched + missing keep fresh values
    np.testing.assert_array_equal(
        ctx.params["params"]["decoder"]["kernel"], np.zeros((8, 5), np.float32)
    )
    np.testing.assert_array_equal(
        ctx.params["params"]["new_head"]["kernel"], np.ones((2, 2), np.float32)
    )
    assert ctx.metadata["transfer_copied"] == 1
    assert any("decoder" in s for s in ctx.metadata["transfer_skipped"])


def test_freeze_modifier(saved_params):
    params, path = saved_params
    pipe = CheckpointPipeline([
        {"stage": "source", "name": "local", "path": path},
        {"stage": "loading", "name": "weights_only"},
        {"stage": "modifier", "name": "freeze", "submodules": ["encoder"]},
    ])
    ctx = pipe.run(CheckpointContext(params=fresh_like(params)))
    mask = ctx.trainable_mask
    assert mask["params"]["encoder"]["kernel"] is False
    assert mask["params"]["decoder"]["kernel"] is True


def test_stage_order_enforced(saved_params):
    _, path = saved_params
    with pytest.raises(AssertionError):
        CheckpointPipeline([
            {"stage": "loading", "name": "weights_only"},
            {"stage": "source", "name": "local", "path": path},
        ])


def test_migrations_roundtrip():
    mig = Migrator()

    @mig.register("001_rename")
    def rename(ckpt):
        ckpt = dict(ckpt)
        ckpt["new_name"] = ckpt.pop("old_name")
        return ckpt

    @rename.rollback
    def rename_down(ckpt):
        ckpt = dict(ckpt)
        ckpt["old_name"] = ckpt.pop("new_name")
        return ckpt

    @mig.register("002_scale")
    def scale(ckpt):
        ckpt = dict(ckpt)
        ckpt["value"] = ckpt["value"] * 2
        return ckpt

    old = {"old_name": 1, "value": 10, "metadata": {}}
    new = mig.migrate(old)
    assert new["new_name"] == 1 and new["value"] == 20
    assert new["metadata"]["migrations"] == ["001_rename", "002_scale"]
    # idempotent
    again = mig.migrate(new)
    assert again["value"] == 20
    # rolling back past a migration without a registered rollback raises
    with pytest.raises(RuntimeError):
        mig.rollback_to(new, "001_rename")

    @scale.rollback
    def scale_down(ckpt):
        ckpt = dict(ckpt)
        ckpt["value"] = ckpt["value"] // 2
        return ckpt

    back = mig.rollback_to(new, "001_rename")
    assert back["value"] == 10 and back["new_name"] == 1
    assert back["metadata"]["migrations"] == ["001_rename"]
    back0 = mig.rollback_to(back, "")
    assert back0["old_name"] == 1 and back0["metadata"]["migrations"] == []


def test_default_migrator_stamps_version():
    from anemoi_tpu.models.migrations import MIGRATOR

    ckpt = MIGRATOR.migrate({"params": {}})
    assert ckpt["metadata"]["format_version"] == 1
    assert ckpt["metadata"]["migrations"]

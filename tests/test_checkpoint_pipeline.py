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
    from anemoi_tpu.training.checkpoint_pipeline import CheckpointConfigError

    _, path = saved_params
    with pytest.raises(CheckpointConfigError, match="stage order"):
        CheckpointPipeline([
            {"stage": "loading", "name": "weights_only"},
            {"stage": "source", "name": "local", "path": path},
        ])


def test_pipeline_config_errors(saved_params):
    """Structured config errors (ref checkpoint/exceptions.py taxonomy):
    unknown kinds/components and a strategy without a source are rejected
    with actionable details."""
    from anemoi_tpu.training.checkpoint_pipeline import CheckpointConfigError

    _, path = saved_params
    with pytest.raises(CheckpointConfigError, match="unknown stage kind"):
        CheckpointPipeline([{"stage": "resource", "name": "local"}])
    with pytest.raises(CheckpointConfigError, match="unknown source component") as e:
        CheckpointPipeline([{"stage": "source", "name": "ftp"}])
    assert "local" in e.value.details["available"]
    with pytest.raises(CheckpointConfigError, match="requires a source"):
        CheckpointPipeline([{"stage": "loading", "name": "weights_only"}])
    # cold_start alone is fine
    CheckpointPipeline([{"stage": "loading", "name": "cold_start"}])


def test_checkpoint_not_found_and_catalog():
    from anemoi_tpu.training.checkpoint_pipeline import (
        CheckpointContext,
        CheckpointNotFoundError,
        ComponentCatalog,
    )

    assert {"local", "http", "s3"} <= set(ComponentCatalog.list_sources())
    assert {"cold_start", "weights_only", "warm_start", "transfer_learning"} <= set(
        ComponentCatalog.list_loaders()
    )
    assert "freeze" in ComponentCatalog.list_modifiers()
    pipe = CheckpointPipeline(
        [{"stage": "source", "name": "local", "path": "/nonexistent/ckpt"}]
    )
    with pytest.raises(CheckpointNotFoundError):
        pipe.run(CheckpointContext(params={"params": {}}))


def test_transfer_report_and_strict_weights(saved_params, tmp_path):
    """The catalog transfer report localises incompatibilities per component;
    weights_only(strict) refuses mismatched checkpoints with that report."""
    import jax.numpy as jnp

    from anemoi_tpu.training.checkpoint_pipeline import (
        CheckpointContext,
        CheckpointIncompatibleError,
        ComponentCatalog,
    )

    params, path = saved_params
    # a model whose decoder grew a layer and whose encoder kernel changed shape
    target = {
        "params": {
            "encoder": {"kernel": jnp.zeros((4, 8))},
            "decoder": {"kernel": jnp.zeros((3, 3)), "extra": jnp.zeros(2)},
        }
    }
    source = {
        "params": {
            "encoder": {"kernel": jnp.zeros((4, 4))},
            "decoder": {"kernel": jnp.zeros((3, 3))},
            "legacy": {"w": jnp.zeros(1)},
        }
    }
    report = ComponentCatalog.transfer_report(target, source)
    assert report["decoder"]["matched"] == 1
    assert report["decoder"]["missing_in_checkpoint"] == ["params/decoder/extra"]
    assert report["encoder"]["shape_mismatch"][0]["model"] == [4, 8]
    assert report["legacy"]["unused_in_model"] == ["params/legacy/w"]

    from flax import serialization

    mismatched = str(tmp_path / "mismatched.msgpack")
    with open(mismatched, "wb") as f:
        f.write(serialization.to_bytes(source))
    pipe = CheckpointPipeline([
        {"stage": "source", "name": "local", "path": mismatched},
        {"stage": "loading", "name": "weights_only"},
    ])
    with pytest.raises(CheckpointIncompatibleError) as e:
        pipe.run(CheckpointContext(params=target))
    assert "encoder" in e.value.details["report"]

    # transfer_learning accepts it and records the catalog report
    pipe2 = CheckpointPipeline([
        {"stage": "source", "name": "local", "path": mismatched},
        {"stage": "loading", "name": "transfer_learning"},
    ])
    ctx = pipe2.run(CheckpointContext(params=target))
    assert ctx.metadata["transfer_copied"] == 1
    assert "transfer_report" in ctx.metadata


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


def test_pipeline_health_validation(tmp_path):
    """validate_pipeline_health (ref checkpoint/validation.py:214): completed
    pipelines pass; failure markers / NaN params / structure mismatches are
    reported as issues."""
    import numpy as np
    import jax.numpy as jnp

    from anemoi_tpu.training.checkpoint_pipeline import (
        CheckpointContext,
        CheckpointPipeline,
        CheckpointValidationError,
        validate_pipeline_health,
    )

    params = {"params": {"w": jnp.ones((3,), jnp.float32)}}
    # healthy cold start records completion markers
    ctx = CheckpointPipeline([{"stage": "loading", "name": "cold_start"}]).run(
        CheckpointContext(params=params)
    )
    assert ctx.metadata["stage_0_loading"] == "cold_start: completed"
    assert validate_pipeline_health(ctx)

    # empty metadata -> pipeline never executed
    with pytest.raises(CheckpointValidationError, match="did not execute"):
        validate_pipeline_health(CheckpointContext(params=params))

    # failure marker
    bad = CheckpointContext(params=params)
    bad.metadata["stage_0_source"] = "local: failed"
    assert not validate_pipeline_health(bad, raise_on_error=False)

    # source without a loading strategy
    srconly = CheckpointContext(params=params, loaded={"params": params})
    srconly.metadata["stage_0_source"] = "local: completed"
    with pytest.raises(CheckpointValidationError, match="loading strategy"):
        validate_pipeline_health(srconly)

    # non-finite params
    nan_ctx = CheckpointContext(
        params={"params": {"w": jnp.asarray([1.0, np.nan, 3.0])}}
    )
    nan_ctx.metadata["stage_0_loading"] = "cold_start: completed"
    with pytest.raises(CheckpointValidationError, match="non-finite"):
        validate_pipeline_health(nan_ctx)

    # trainable mask structure mismatch
    mctx = CheckpointContext(params=params, trainable_mask={"params": {"v": True}})
    mctx.metadata["stage_0_loading"] = "cold_start: completed"
    with pytest.raises(CheckpointValidationError, match="trainable_mask"):
        validate_pipeline_health(mctx)

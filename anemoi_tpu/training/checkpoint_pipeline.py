"""Composable checkpoint-loading pipeline.

Equivalent of /root/reference/training/src/anemoi/training/checkpoint/
(CheckpointPipeline pipeline.py:107, sources/{local,http,s3}, loading
strategies.py:26-259, FreezingModifierStage modifiers/freezing.py:27):

    Source -> LoadingStrategy -> Modifier*

operating on a CheckpointContext {params, opt_state, step, metadata}.
Strategies: cold-start / weights-only / warm-start / transfer-learning
(name+shape-matched partial load).  The freezing modifier returns an optax
mask so frozen submodules receive zero updates.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import logging

import flax
import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from anemoi_tpu.utils.registry import Registry

LOGGER = logging.getLogger(__name__)

source_registry = Registry("checkpoint source")
strategy_registry = Registry("loading strategy")
modifier_registry = Registry("checkpoint modifier")


# --- structured exceptions (ref checkpoint/exceptions.py taxonomy) ----
class CheckpointError(Exception):
    """Base checkpoint error carrying structured details."""

    def __init__(self, message: str, details: Optional[Dict[str, Any]] = None):
        super().__init__(message)
        self.details = dict(details or {})

    def __str__(self) -> str:  # message + compact details, greppable
        base = super().__str__()
        if self.details:
            extras = ", ".join(f"{k}={v!r}" for k, v in self.details.items())
            return f"{base} ({extras})"
        return base


class CheckpointNotFoundError(CheckpointError):
    """The requested checkpoint path/URL/object does not exist."""


class CheckpointLoadError(CheckpointError):
    """The checkpoint exists but could not be deserialised."""


class CheckpointIncompatibleError(CheckpointError):
    """The checkpoint does not fit the target model (strict loading)."""


class CheckpointConfigError(CheckpointError):
    """The pipeline configuration itself is invalid (bad stage order,
    unknown component, missing required stage)."""


class CheckpointSourceError(CheckpointError):
    """A source stage failed to fetch (network/credentials/IO)."""


# --- component catalog (ref checkpoint/catalog.py:56 ComponentCatalog) -
class ComponentCatalog:
    """Registry-backed catalog of pipeline components + transfer-compat
    reporting.

    The reference discovers components via reflection over base classes;
    here the explicit registries ARE the catalog (this framework's stated
    replacement for `_target_` reflection), so discovery is a listing."""

    @staticmethod
    def list_sources() -> List[str]:
        return sorted(source_registry.names())

    @staticmethod
    def list_loaders() -> List[str]:
        return sorted(strategy_registry.names())

    @staticmethod
    def list_modifiers() -> List[str]:
        return sorted(modifier_registry.names())

    @staticmethod
    def transfer_report(target_params, source_params) -> Dict[str, Dict[str, Any]]:
        """Per-component compatibility report between a target model's
        parameter tree and a loaded checkpoint's: for each top-level
        component (encoder/processor/decoder/...), how many leaves match
        exactly, which mismatch in shape, which are missing from the
        checkpoint, and which checkpoint leaves have no target.

        This is what the reference's catalog-driven transfer-learning
        report provides for mismatched models."""
        target = flax.traverse_util.flatten_dict(jax.device_get(target_params))
        source = flax.traverse_util.flatten_dict(source_params)

        def component_of(key) -> str:
            # ('params', 'encoder', ...) -> 'encoder'
            parts = [str(p) for p in key]
            return parts[1] if parts and parts[0] == "params" and len(parts) > 1 else parts[0]

        report: Dict[str, Dict[str, Any]] = {}

        def entry(comp: str) -> Dict[str, Any]:
            return report.setdefault(
                comp,
                {"matched": 0, "shape_mismatch": [], "missing_in_checkpoint": [],
                 "unused_in_model": []},
            )

        for k, v in target.items():
            comp = entry(component_of(k))
            path = "/".join(map(str, k))
            sv = source.get(k)
            if sv is None:
                comp["missing_in_checkpoint"].append(path)
            elif np.shape(sv) != np.shape(v):
                comp["shape_mismatch"].append(
                    {"path": path, "model": list(np.shape(v)),
                     "checkpoint": list(np.shape(sv))}
                )
            else:
                comp["matched"] += 1
        for k in source:
            if k not in target:
                entry(component_of(k))["unused_in_model"].append("/".join(map(str, k)))
        return report


@dataclass
class CheckpointContext:
    """State threaded through the pipeline (ref checkpoint/base.py:57)."""

    params: Any  # current (template/target) params
    opt_state: Any = None
    step: int = 0
    loaded: Optional[Dict] = None  # raw payload from the source
    trainable_mask: Any = None  # optax mask (True = trainable)
    metadata: Dict = field(default_factory=dict)


# --- sources ----------------------------------------------------------
@source_registry.register("local")
class LocalSource:
    def __init__(self, path: str):
        self.path = path

    def __call__(self, ctx: CheckpointContext) -> CheckpointContext:
        path = self.path
        if not os.path.exists(path):
            raise CheckpointNotFoundError(
                "checkpoint path does not exist", {"path": path}
            )
        if os.path.isdir(path):  # inference bundle directory
            path = os.path.join(path, "params.msgpack")
            if not os.path.exists(path):
                raise CheckpointNotFoundError(
                    "directory is not an inference bundle (no params.msgpack)",
                    {"path": self.path},
                )
            # bundles record the variable order; surface it for the
            # CheckVariableOrder sanity callback (ref callbacks/sanity.py:20)
            meta_path = os.path.join(self.path, "checkpoint.json")
            if os.path.exists(meta_path):
                import json

                with open(meta_path) as f:
                    bundle_meta = json.load(f)
                n2i = {
                    ds: di.get("name_to_index")
                    for ds, di in bundle_meta.get("data_indices", {}).items()
                }
                if any(n2i.values()):
                    ctx.metadata["name_to_index"] = n2i
                # full bundle metadata (provenance, per-dataset
                # variables_metadata) for downstream compat checks
                if bundle_meta.get("metadata"):
                    ctx.metadata["bundle_metadata"] = bundle_meta["metadata"]
        with open(path, "rb") as f:
            blob = f.read()
        template = jax.device_get(ctx.params)
        try:
            ctx.loaded = {"params": serialization.from_bytes(template, blob)}
        except Exception:
            # structure mismatch: keep the raw state dict for transfer loading
            try:
                ctx.loaded = {"params": serialization.msgpack_restore(blob)}
            except Exception as err:
                raise CheckpointLoadError(
                    "could not deserialise checkpoint",
                    {"path": path, "error": str(err)},
                ) from err
        ctx.metadata["source"] = self.path
        return ctx


@source_registry.register("http")
class HTTPSource:
    """Download a checkpoint over HTTP (ref sources/http.py:44)."""

    def __init__(self, url: str, cache_dir: str = "/tmp/anemoi_tpu_ckpt_cache"):
        self.url = url
        self.cache_dir = cache_dir

    def __call__(self, ctx: CheckpointContext) -> CheckpointContext:
        import urllib.request

        os.makedirs(self.cache_dir, exist_ok=True)
        local = os.path.join(self.cache_dir, os.path.basename(self.url))
        if not os.path.exists(local):
            urllib.request.urlretrieve(self.url, local)  # noqa: S310
        return LocalSource(local)(ctx)


@source_registry.register("s3")
class S3Source:
    """S3 checkpoint source (ref sources/s3.py:46); needs boto3 at runtime."""

    def __init__(self, bucket: str, key: str, cache_dir: str = "/tmp/anemoi_tpu_ckpt_cache"):
        self.bucket, self.key, self.cache_dir = bucket, key, cache_dir

    def __call__(self, ctx: CheckpointContext) -> CheckpointContext:
        try:
            import boto3  # type: ignore
        except ImportError as e:  # pragma: no cover
            raise RuntimeError("S3Source requires boto3") from e
        os.makedirs(self.cache_dir, exist_ok=True)
        local = os.path.join(self.cache_dir, os.path.basename(self.key))
        if not os.path.exists(local):
            boto3.client("s3").download_file(self.bucket, self.key, local)
        return LocalSource(local)(ctx)


# --- loading strategies -----------------------------------------------
@strategy_registry.register("cold_start")
class ColdStart:
    def __call__(self, ctx: CheckpointContext) -> CheckpointContext:
        return ctx  # keep freshly initialised params


@strategy_registry.register("weights_only")
class WeightsOnly:
    """Load weights, reset optimizer state (ref strategies.py:26)."""

    def __init__(self, strict: bool = True):
        self.strict = strict

    def __call__(self, ctx: CheckpointContext) -> CheckpointContext:
        if ctx.loaded is None:
            raise CheckpointConfigError("weights_only needs a source stage first")
        if self.strict:
            report = ComponentCatalog.transfer_report(ctx.params, ctx.loaded["params"])
            bad = {
                comp: r for comp, r in report.items()
                if r["shape_mismatch"] or r["missing_in_checkpoint"]
            }
            if bad:
                raise CheckpointIncompatibleError(
                    "checkpoint does not fit the model (use transfer_learning "
                    "for partial loads)",
                    {"report": bad},
                )
        ctx.params = ctx.loaded["params"]
        ctx.metadata["loading"] = "weights_only"
        return ctx


@strategy_registry.register("warm_start")
class WarmStart:
    """Load weights + optimizer state + step (ref strategies.py:172)."""

    def __call__(self, ctx: CheckpointContext) -> CheckpointContext:
        if ctx.loaded is None:
            raise CheckpointConfigError("warm_start needs a source stage first")
        ctx.params = ctx.loaded["params"]
        if "opt_state" in ctx.loaded:
            ctx.opt_state = ctx.loaded["opt_state"]
        ctx.step = int(ctx.loaded.get("step", ctx.step))
        ctx.metadata["loading"] = "warm_start"
        return ctx


@strategy_registry.register("transfer_learning")
class TransferLearning:
    """Partial load: copy leaves whose path AND shape match; everything else
    keeps its fresh initialisation (ref strategies.py:94 + the reference's
    variable-matching transfer loader in utils/checkpoint.py)."""

    def __call__(self, ctx: CheckpointContext) -> CheckpointContext:
        if ctx.loaded is None:
            raise CheckpointConfigError("transfer_learning needs a source stage first")
        target = flax.traverse_util.flatten_dict(jax.device_get(ctx.params))
        source = flax.traverse_util.flatten_dict(ctx.loaded["params"])
        copied, skipped = 0, []
        merged = {}
        for k, v in target.items():
            sv = source.get(k)
            if sv is not None and np.shape(sv) == np.shape(v):
                merged[k] = sv
                copied += 1
            else:
                merged[k] = v
                skipped.append("/".join(map(str, k)))
        ctx.params = flax.traverse_util.unflatten_dict(merged)
        ctx.metadata["loading"] = "transfer_learning"
        ctx.metadata["transfer_copied"] = copied
        ctx.metadata["transfer_skipped"] = skipped
        # catalog-driven per-component compatibility report (ref catalog.py:56)
        ctx.metadata["transfer_report"] = ComponentCatalog.transfer_report(
            ctx.params, ctx.loaded["params"]
        )
        return ctx


# --- modifiers --------------------------------------------------------
@modifier_registry.register("freeze")
class FreezingModifier:
    """Freeze submodules by name substring (ref modifiers/freezing.py:27).

    Produces ``trainable_mask`` for `optax.masked`; the trainer multiplies
    updates by the mask so frozen parameters stay fixed."""

    def __init__(self, submodules: List[str]):
        self.submodules = list(submodules)

    def __call__(self, ctx: CheckpointContext) -> CheckpointContext:
        flat = flax.traverse_util.flatten_dict(jax.device_get(ctx.params))
        mask = {
            k: not any(name in "/".join(map(str, k)) for name in self.submodules)
            for k in flat
        }
        ctx.trainable_mask = flax.traverse_util.unflatten_dict(mask)
        ctx.metadata["frozen_submodules"] = self.submodules
        return ctx


class CheckpointPipeline:
    """Ordered stages applied to a context (ref pipeline.py:107-513).

    Config: [{"stage": "source", "name": "local", "path": ...},
             {"stage": "loading", "name": "transfer_learning"},
             {"stage": "modifier", "name": "freeze", "submodules": ["encoder"]}]
    Stage ordering is validated: sources before strategies before modifiers.
    """

    ORDER = {"source": 0, "loading": 1, "modifier": 2}

    def __init__(self, stage_configs: List[dict]):
        self.stages = []
        kinds = []
        last = -1
        registries = {
            "source": source_registry,
            "loading": strategy_registry,
            "modifier": modifier_registry,
        }
        for i, cfg in enumerate(stage_configs):
            cfg = dict(cfg)
            kind = cfg.pop("stage", None)
            if kind not in self.ORDER:
                raise CheckpointConfigError(
                    f"unknown stage kind '{kind}'",
                    {"position": i, "valid": sorted(self.ORDER)},
                )
            if self.ORDER[kind] < last:
                raise CheckpointConfigError(
                    f"invalid stage order: '{kind}' cannot follow a later "
                    "stage (sources -> loading -> modifiers)",
                    {"position": i, "stages": [c.get("stage") for c in stage_configs]},
                )
            last = self.ORDER[kind]
            registry = registries[kind]
            name = cfg.get("name")
            if name not in registry:
                raise CheckpointConfigError(
                    f"unknown {kind} component '{name}'",
                    {"available": sorted(registry.names())},
                )
            kinds.append(kind)
            self.stages.append((kind, str(name), registry.build_from_config(cfg)))
        # a non-cold-start strategy cannot run without a source stage
        needs_source = any(
            c.get("stage") == "loading" and c.get("name") != "cold_start"
            for c in stage_configs
        )
        if needs_source and "source" not in kinds:
            raise CheckpointConfigError(
                "loading strategy requires a source stage before it",
                {"stages": [c.get("stage") for c in stage_configs]},
            )

    def run(self, ctx: CheckpointContext) -> CheckpointContext:
        for i, (kind, name, stage) in enumerate(self.stages):
            marker = f"stage_{i}_{kind}"
            try:
                ctx = stage(ctx)
            except Exception:
                ctx.metadata[marker] = f"{name}: failed"
                raise
            ctx.metadata[marker] = f"{name}: completed"
        return ctx


class CheckpointValidationError(CheckpointError):
    """Post-run pipeline health check failed; ``details['issues']`` lists
    each problem (ref checkpoint/exceptions.py + validation.py:214)."""


def validate_pipeline_health(
    ctx: CheckpointContext, *, raise_on_error: bool = True
) -> bool:
    """Check that a finished pipeline left the context in a sane state
    (ref checkpoint/validation.py:214-324, adapted to the JAX context):

    - every ``stage_<i>_*`` marker records completion, none failed,
    - a source stage implies a loaded payload AND a loading strategy ran,
    - params contain no non-finite leaves after loading,
    - a trainable mask (freezing) matches the params tree structure.
    """
    issues: List[str] = []
    markers = {k: v for k, v in ctx.metadata.items() if k.startswith("stage_")}
    if not ctx.metadata:
        issues.append("context metadata is empty; pipeline did not execute")
    for key, value in markers.items():
        if not isinstance(value, str):
            issues.append(f"stage entry {key!r} has non-string value {value!r}")
        elif "failed" in value:
            issues.append(f"stage {key!r} did not complete: {value}")
    source_ran = any("_source" in k for k in markers)
    if source_ran:
        if ctx.loaded is None and "loading" not in ctx.metadata:
            issues.append("a source stage executed but nothing was loaded")
        if not any("_loading" in k for k in markers):
            issues.append("a source stage executed without a loading strategy")
    if ctx.params is not None:
        bad = [
            jax.tree_util.keystr(path)
            for path, leaf in jax.tree_util.tree_leaves_with_path(ctx.params)
            if hasattr(leaf, "dtype")
            and jnp.issubdtype(leaf.dtype, jnp.floating)
            and not bool(jnp.isfinite(leaf).all())
        ]
        if bad:
            issues.append(f"non-finite params after loading: {bad[:5]}")
    if ctx.trainable_mask is not None:
        if (
            jax.tree_util.tree_structure(ctx.trainable_mask)
            != jax.tree_util.tree_structure(ctx.params)
        ):
            issues.append("trainable_mask tree structure does not match params")
    if not issues:
        return True
    if raise_on_error:
        raise CheckpointValidationError(
            "pipeline health check failed", {"issues": issues}
        )
    LOGGER.warning("pipeline health check found %d issue(s): %s", len(issues), issues)
    return False

"""Pydantic config validation.

Equivalent of /root/reference/training/src/anemoi/training/schemas/
(base_schema.py:225 BaseSchema + the models/training/data sub-schemas):
validate the composed config before training; opt out with
``config_validation: false`` (UnvalidatedBaseSchema equivalent).

Stronger than static enums where possible: component NAMES are validated
against the live registries (models, mappers, processors, losses, scalers,
boundings, residuals, noise injectors, preprocessors, graph builders), so a
typo'd name fails here instead of deep inside jit, and newly registered
components never drift out of the schema."""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Union

from pydantic import BaseModel, ConfigDict, Field, field_validator, model_validator


def _check_registry(kind: str):
    """Return a validator asserting cfg['name'] is registered for ``kind``."""

    def check(name: str) -> str:
        reg = _registries()[kind]
        if name not in reg:
            known = ", ".join(sorted(reg))
            raise ValueError(f"unknown {kind} '{name}'. Known: {known}")
        return name

    return check


def _registries() -> Dict[str, Any]:
    # imported lazily: schemas must not drag model code in at import time
    from anemoi_tpu.graphs.edges import edge_attribute_registry, edge_builder_registry
    from anemoi_tpu.graphs.nodes import node_attribute_registry, node_builder_registry
    from anemoi_tpu.models import model_registry
    from anemoi_tpu.models.encoder_processor_decoder import (
        DECODERS,
        ENCODERS,
        PROCESSORS,
    )
    from anemoi_tpu.models.layers.bounding import bounding_registry
    from anemoi_tpu.models.layers.ensemble import noise_injector_registry
    from anemoi_tpu.models.layers.residual import residual_registry
    from anemoi_tpu.preprocessing.processors import processor_registry
    from anemoi_tpu.training.losses.base import loss_registry
    from anemoi_tpu.training.losses.scalers import scaler_registry

    return {
        "model": model_registry,
        "encoder": ENCODERS,
        "decoder": DECODERS,
        "processor": PROCESSORS,
        "bounding": bounding_registry,
        "residual": residual_registry,
        "noise injector": noise_injector_registry,
        "preprocessor": processor_registry,
        "loss": loss_registry,
        "scaler": scaler_registry,
        "node builder": node_builder_registry,
        "node attribute": node_attribute_registry,
        "edge builder": edge_builder_registry,
        "edge attribute": edge_attribute_registry,
    }


class ComponentConfig(BaseModel):
    """A registry component reference: {"name": ..., **kwargs}."""

    model_config = ConfigDict(extra="allow")
    name: str


class EncoderConfig(ComponentConfig):
    name: str = "GraphTransformerForwardMapper"
    num_heads: int = Field(default=16, ge=1)
    mlp_hidden_ratio: float = Field(default=4.0, gt=0)
    qk_norm: bool = False
    qk_norm_type: str = "layernorm"
    trainable_size: int = Field(default=0, ge=0)

    _name = field_validator("name")(_check_registry("encoder"))

    @field_validator("qk_norm_type")
    @classmethod
    def _qknt(cls, v: str) -> str:
        assert v in ("layernorm", "rmsnorm"), f"unknown qk_norm_type '{v}'"
        return v


class ProcessorConfig(ComponentConfig):
    name: str = "GraphTransformerProcessor"
    num_layers: int = Field(default=16, ge=1)
    num_heads: int = Field(default=16, ge=1)
    mlp_hidden_ratio: float = Field(default=4.0, gt=0)
    window_size: Optional[int] = Field(default=None, ge=1)
    qk_norm: bool = False
    mlp_implementation: str = "mlp"
    gradient_checkpointing: bool = True
    # remat selectivity: full (save nothing) | save_attention (keep the
    # Pallas kernels' out/lse so backward never re-runs the forward kernel)
    # | dots (save matmul outputs, recompute elementwise only)
    remat_policy: Optional[str] = "save_attention"
    scan_layers: bool = True
    trainable_size: int = Field(default=0, ge=0)

    @field_validator("remat_policy")
    @classmethod
    def _remat_policy(cls, v: Optional[str]) -> Optional[str]:
        assert v in (
            None, "full", "save_attention", "save_attention_mlp", "dots"
        ), f"unknown remat_policy '{v}'"
        return v

    _name = field_validator("name")(_check_registry("processor"))

    @field_validator("mlp_implementation")
    @classmethod
    def _mlp_impl(cls, v: str) -> str:
        assert v in ("mlp", "glu", "swiglu", "geglu", "reglu"), (
            f"unknown mlp_implementation '{v}'"
        )
        return v


class DecoderConfig(ComponentConfig):
    name: str = "GraphTransformerBackwardMapper"
    num_heads: int = Field(default=16, ge=1)
    mlp_hidden_ratio: float = Field(default=4.0, gt=0)
    initialise_data_extractor_zero: bool = False
    trainable_size: int = Field(default=0, ge=0)

    _name = field_validator("name")(_check_registry("decoder"))


class ModelSchema(BaseModel):
    model_config = ConfigDict(extra="allow")
    name: str = "AnemoiModelEncProcDec"
    num_channels: int = Field(default=1024, ge=1)
    n_step_input: int = Field(default=2, ge=1)
    n_step_output: int = Field(default=1, ge=1)
    latent_skip: bool = True
    graph_attention_backend: str = "padded"
    shard_strategy: str = "none"
    num_model_shards: int = Field(default=1, ge=1)
    bucketed_gathers: bool = True
    paged_mappers: bool = True
    paged_block: Optional[List[int]] = None
    paged_mapper_block: Optional[List[int]] = None
    # fused backward: kv-grad reduction recomputes attention per page visit
    # (drops the [num_flat, 2HD] dkv HBM transient); mapper knob defaults to
    # the model-wide one when unset
    paged_fused_bwd: bool = False
    paged_mapper_fused_bwd: Optional[bool] = None
    # edges strategy: split each shard's destinations into interior rows
    # (local sources only) and boundary rows so XLA overlaps the per-layer
    # halo all_to_all with the interior attention (parallel/halo.py)
    halo_overlap: bool = True
    # serving precision (predict_step / forecast CLI / transport sampler):
    # bf16 model forward with fp32 pre/post-processing (ref serves 16-mixed)
    inference_precision: str = "bf16"
    # gspmd + paged auto-upgrades to the halo route (docs/design.md §7 r5)
    gspmd_paged_upgrade: bool = True
    # hierarchical (r5 ref-compat): per-level channel growth (ref hard-codes
    # 2), per-level processor depth (ref model.level_process_num_layers)
    level_channel_ratio: int = Field(default=1, ge=1)
    level_process_num_layers: Optional[int] = Field(default=None, ge=1)
    # ensemble (r5): reference forecast-step input channel, clamped min(1, t)
    fcstep_input: bool = True
    # transport (r5 ref-compat): wide noise embedding -> Linear/SiLU/Linear
    # cond MLP + noise-conditioned mappers; None = lean direct embedding
    noise_channels: Optional[int] = Field(default=None, ge=2)
    noise_cond_dim: Optional[int] = Field(default=None, ge=1)
    noise_max_period: Optional[float] = None
    conditional_mappers: Optional[bool] = None

    @field_validator("inference_precision")
    @classmethod
    def _inference_precision(cls, v):
        assert v in ("fp32", "bf16", "bfloat16", "16-mixed"), (
            f"unknown inference_precision '{v}'"
        )
        return v

    @field_validator("paged_block", "paged_mapper_block")
    @classmethod
    def _paged_block(cls, v):
        if v is not None:
            assert len(v) == 3 and all(int(x) > 0 for x in v), (
                "paged block must be [block_dst, page, r] positive ints"
            )
        return v
    encoder: EncoderConfig = EncoderConfig()
    processor: ProcessorConfig = ProcessorConfig()
    decoder: DecoderConfig = DecoderConfig()
    trainable_parameters: Optional[Dict[str, int]] = None
    bounding: Optional[List[Dict[str, Any]]] = None
    residual: Optional[Dict[str, Any]] = None
    noise_injector: Optional[Dict[str, Any]] = None

    _name = field_validator("name")(_check_registry("model"))

    @field_validator("graph_attention_backend")
    @classmethod
    def _backend(cls, v: str) -> str:
        assert v in ("segment", "padded", "paged"), f"unknown graph_attention_backend '{v}'"
        return v

    @field_validator("shard_strategy")
    @classmethod
    def _shard(cls, v: str) -> str:
        assert v in ("none", "gspmd", "edges", "heads"), (
            f"unknown shard_strategy '{v}' (none|gspmd|edges|heads)"
        )
        return v

    @field_validator("bounding")
    @classmethod
    def _bounding(cls, v):
        if v:
            check = _check_registry("bounding")
            for entry in v:
                check(entry.get("name", "?"))
        return v

    @field_validator("residual")
    @classmethod
    def _residual(cls, v):
        if v and "name" in v:
            _check_registry("residual")(v["name"])
        return v

    @field_validator("noise_injector")
    @classmethod
    def _noise(cls, v):
        if v and "name" in v:
            _check_registry("noise injector")(v["name"])
        return v

    @field_validator("trainable_parameters")
    @classmethod
    def _trainable(cls, v):
        if v:
            for k, size in v.items():
                assert int(size) >= 0, f"trainable_parameters[{k}] must be >= 0"
        return v


class LRSchema(BaseModel):
    model_config = ConfigDict(extra="allow")
    rate: float = Field(default=1e-4, gt=0)
    min: float = Field(default=3e-7, ge=0)
    warmup: int = Field(default=1000, ge=0)
    iterations: int = Field(default=300000, ge=1)


class RolloutSchema(BaseModel):
    model_config = ConfigDict(extra="allow")
    start: int = Field(default=1, ge=1)
    epoch_increment: int = Field(default=0, ge=0)
    max: int = Field(default=1, ge=1)

    @model_validator(mode="after")
    def _max_ge_start(self):
        assert self.max >= self.start, "rollout.max must be >= rollout.start"
        return self


class GradientClipSchema(BaseModel):
    model_config = ConfigDict(extra="allow")
    val: float = Field(default=32.0, gt=0)
    algorithm: str = "value"

    @field_validator("algorithm")
    @classmethod
    def _alg(cls, v: str) -> str:
        assert v in ("value", "norm"), f"unknown gradient_clip.algorithm '{v}'"
        return v


class OptimizerSchema(BaseModel):
    model_config = ConfigDict(extra="allow")
    name: str = "adamw"
    b1: float = Field(default=0.9, gt=0, lt=1)
    b2: float = Field(default=0.95, gt=0, lt=1)
    weight_decay: float = Field(default=0.0, ge=0)
    zero: bool = False  # ZeRO-1-style optimizer-state sharding over 'data' 

    @field_validator("name")
    @classmethod
    def _name(cls, v: str) -> str:
        assert v in ("adamw", "adam", "sgd", "ademamix"), f"unknown optimizer '{v}'"
        return v


class TrainingSchema(BaseModel):
    model_config = ConfigDict(extra="allow")
    max_epochs: int = Field(default=1, ge=1)
    max_steps: Optional[int] = Field(default=None, ge=1)
    lr: LRSchema = LRSchema()
    rollout: RolloutSchema = RolloutSchema()
    gradient_clip: GradientClipSchema = GradientClipSchema()
    optimizer: OptimizerSchema = OptimizerSchema()
    loss: Optional[Dict[str, Any]] = None
    scalers: Optional[Dict[str, Any]] = None
    precision: str = "fp32"
    # keep the decoder output head (extractor + its norm) in fp32 under bf16
    # compute: the prognostic increment/residual/boundings then run fp32
    # (long-horizon rollout numerics; no effect when precision is fp32)
    fp32_head: bool = False
    task: str = "forecaster"
    ensemble_size: int = Field(default=1, ge=1)
    validation_rollout: int = Field(default=0, ge=0)
    precompile_rollouts: bool = True
    remat_rollout: bool = True
    # rollout-checkpoint remat selectivity (full | save_attention | dots):
    # save_attention keeps the Pallas kernels' out/lse across rollout steps
    remat_policy: Optional[str] = None
    # donate the train state to the step executable (in/out aliasing) at the
    # cost of the caller's right to reuse the pre-step state pytree; measured
    # neutral on speed and NOT a reliable peak-HBM lever (see step.py note)
    donate_state: bool = False
    transport: Optional[Dict[str, Any]] = None

    @field_validator("transport")
    @classmethod
    def _transport(cls, v):
        if v and "objective" in v:
            assert v["objective"] in ("edm", "interpolant"), (
                f"unknown transport objective '{v['objective']}'"
            )
        return v

    @field_validator("precision")
    @classmethod
    def _precision(cls, v: str) -> str:
        assert v in ("fp32", "bf16", "bfloat16", "16-mixed"), f"unknown precision '{v}'"
        return v

    @field_validator("task")
    @classmethod
    def _task(cls, v: str) -> str:
        assert v in ("forecaster", "autoencoder", "temporal_downscaler", "transport"), (
            f"unknown task '{v}'"
        )
        return v

    @field_validator("loss")
    @classmethod
    def _loss(cls, v):
        if v and "name" in v:
            _check_registry("loss")(v["name"])
            for member in v.get("losses") or []:  # CombinedLoss members
                if isinstance(member, dict) and "name" in member:
                    _check_registry("loss")(member["name"])
        return v

    @field_validator("scalers")
    @classmethod
    def _scalers(cls, v):
        if v:
            check = _check_registry("scaler")
            for key, cfg in v.items():
                if isinstance(cfg, dict) and "name" in cfg:
                    check(cfg["name"])
        return v


class HardwareSchema(BaseModel):
    model_config = ConfigDict(extra="allow")
    num_devices: Optional[int] = Field(default=None, ge=1)
    num_devices_per_model: int = Field(default=1, ge=1)
    num_devices_per_ensemble: int = Field(default=1, ge=1)
    platform: Optional[str] = None
    num_virtual_devices: Optional[int] = Field(default=None, ge=1)

    @field_validator("platform")
    @classmethod
    def _platform(cls, v):
        if v is not None:
            assert v in ("cpu", "tpu", "gpu", "axon"), f"unknown platform '{v}'"
        return v

    @model_validator(mode="after")
    def _divisible(self):
        if self.num_devices is not None:
            per = self.num_devices_per_model * self.num_devices_per_ensemble
            assert self.num_devices % per == 0, (
                f"num_devices ({self.num_devices}) must be divisible by "
                f"num_devices_per_model x num_devices_per_ensemble ({per})"
            )
        return self


class DataloaderSchema(BaseModel):
    model_config = ConfigDict(extra="allow")
    batch_size: int = Field(default=1, ge=1)
    validation_fraction: float = Field(default=0.15, ge=0.0, lt=1.0)
    shard_grid: bool = True
    prefetch: int = Field(default=2, ge=0)  # device-staged batches ahead


class DiagnosticsSchema(BaseModel):
    model_config = ConfigDict(extra="allow")
    log_interval: int = Field(default=10, ge=1)
    checkpoint_interval: int = Field(default=500, ge=1)
    callbacks: Optional[List[Dict[str, Any]]] = None
    loggers: Optional[List[Dict[str, Any]]] = None


class DatasetSchema(BaseModel):
    model_config = ConfigDict(extra="allow")
    kind: str = "synthetic"

    @field_validator("kind")
    @classmethod
    def _kind(cls, v: str) -> str:
        assert v in ("synthetic", "npy", "zarr", "trajectory"), f"unknown dataset kind '{v}'"
        return v


class DataSchema(BaseModel):
    model_config = ConfigDict(extra="allow")
    datasets: Dict[str, DatasetSchema]
    forcing: Optional[List[str]] = None
    diagnostic: Optional[List[str]] = None
    target: Optional[List[str]] = None
    processors: Optional[List[Dict[str, Any]]] = None

    @field_validator("processors")
    @classmethod
    def _processors(cls, v):
        if v:
            check = _check_registry("preprocessor")
            for entry in v:
                check(entry.get("name", "?"))
        return v

    @model_validator(mode="after")
    def _disjoint(self):
        f, d, t = set(self.forcing or []), set(self.diagnostic or []), set(self.target or [])
        assert f.isdisjoint(d), f"forcing/diagnostic overlap: {f & d}"
        assert d.isdisjoint(t), f"diagnostic/target overlap: {d & t}"
        return self


class GraphRecipeSchema(BaseModel):
    model_config = ConfigDict(extra="allow")
    nodes: Optional[Dict[str, Dict[str, Any]]] = None
    edges: Optional[List[Dict[str, Any]]] = None
    post_processors: Optional[List[Dict[str, Any]]] = None

    @field_validator("nodes")
    @classmethod
    def _nodes(cls, v):
        if v:
            check = _check_registry("node builder")
            attr_check = _check_registry("node attribute")
            for name, cfg in v.items():
                builder = (cfg or {}).get("node_builder") or {}
                if "name" in builder:
                    check(builder["name"])
                for attr_cfg in ((cfg or {}).get("attributes") or {}).values():
                    if "name" in attr_cfg:
                        attr_check(attr_cfg["name"])
        return v

    @field_validator("edges")
    @classmethod
    def _edges(cls, v):
        if v:
            check = _check_registry("edge builder")
            attr_check = _check_registry("edge attribute")
            for entry in v:
                builder = entry.get("edge_builder") or {}
                if "name" in builder:
                    check(builder["name"])
                for attr_cfg in (entry.get("attributes") or {}).values():
                    if "name" in attr_cfg:
                        attr_check(attr_cfg["name"])
        return v


class GraphSchema(BaseModel):
    model_config = ConfigDict(extra="allow")
    recipe: Optional[GraphRecipeSchema] = None
    save_path: Optional[str] = None
    load_path: Optional[str] = None


class BaseSchema(BaseModel):
    model_config = ConfigDict(extra="allow")
    data: DataSchema
    model: ModelSchema = ModelSchema()
    training: TrainingSchema = TrainingSchema()
    graph: GraphSchema = GraphSchema()
    hardware: HardwareSchema = HardwareSchema()
    dataloader: DataloaderSchema = DataloaderSchema()
    diagnostics: DiagnosticsSchema = DiagnosticsSchema()


def validate_config(config: Dict[str, Any]) -> BaseSchema:
    return BaseSchema(**config)

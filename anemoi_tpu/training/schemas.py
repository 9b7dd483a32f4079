"""Pydantic config validation.

Equivalent of /root/reference/training/src/anemoi/training/schemas/base_schema.py:225
(BaseSchema): validate the composed config before training; opt out with
``config_validation: false`` (UnvalidatedBaseSchema equivalent).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

from pydantic import BaseModel, ConfigDict, Field, field_validator


class ComponentConfig(BaseModel):
    """A registry component reference: {"name": ..., **kwargs}."""

    model_config = ConfigDict(extra="allow")
    name: str


class EncoderConfig(ComponentConfig):
    name: str = "GraphTransformerForwardMapper"


class ProcessorConfig(ComponentConfig):
    name: str = "GraphTransformerProcessor"
    num_layers: int = Field(default=16, ge=1)


class DecoderConfig(ComponentConfig):
    name: str = "GraphTransformerBackwardMapper"


class ModelSchema(BaseModel):
    model_config = ConfigDict(extra="allow")
    name: str = "AnemoiModelEncProcDec"
    num_channels: int = Field(default=1024, ge=1)
    n_step_input: int = Field(default=2, ge=1)
    n_step_output: int = Field(default=1, ge=1)
    latent_skip: bool = True
    graph_attention_backend: str = "padded"
    encoder: EncoderConfig = EncoderConfig()
    processor: ProcessorConfig = ProcessorConfig()
    decoder: DecoderConfig = DecoderConfig()
    trainable_parameters: Optional[Dict[str, int]] = None
    bounding: Optional[List[Dict[str, Any]]] = None
    residual: Optional[Dict[str, Any]] = None

    @field_validator("graph_attention_backend")
    @classmethod
    def _backend(cls, v: str) -> str:
        assert v in ("segment", "padded", "pallas"), f"unknown graph_attention_backend '{v}'"
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


class TrainingSchema(BaseModel):
    model_config = ConfigDict(extra="allow")
    max_epochs: int = Field(default=1, ge=1)
    lr: LRSchema = LRSchema()
    rollout: RolloutSchema = RolloutSchema()
    loss: Optional[Dict[str, Any]] = None
    scalers: Optional[Dict[str, Any]] = None
    optimizer: Optional[Dict[str, Any]] = None


class DataSchema(BaseModel):
    model_config = ConfigDict(extra="allow")
    datasets: Dict[str, Dict[str, Any]]
    forcing: Optional[List[str]] = None
    diagnostic: Optional[List[str]] = None
    target: Optional[List[str]] = None
    processors: Optional[List[Dict[str, Any]]] = None


class BaseSchema(BaseModel):
    model_config = ConfigDict(extra="allow")
    data: DataSchema
    model: ModelSchema = ModelSchema()
    training: TrainingSchema = TrainingSchema()
    graph: Dict[str, Any] = {}
    dataloader: Dict[str, Any] = {}
    diagnostics: Dict[str, Any] = {}


def validate_config(config: Dict[str, Any]) -> BaseSchema:
    return BaseSchema(**config)

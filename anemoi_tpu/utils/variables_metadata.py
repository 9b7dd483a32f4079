"""Variable-metadata utilities: group/level extraction and compat checks.

Equivalent of /root/reference/training/src/anemoi/training/utils/
variables_metadata.py — the variable-group/level algebra used by the loss
scalers (ExtractVariableGroupAndLevel, ref :195) plus the checkpoint /
dataset variable compatibility checks (ref :23,38,101).

The reference leans on ``anemoi.transform.variables.Variable``; here a
minimal :class:`VariableMetadata` carries the same fields consumed by the
training stack (param, level, surface flag, units) parsed from the
dataset's per-variable metadata dict (mars request keys or plain keys).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple, Union

LOGGER = logging.getLogger(__name__)

GROUP_SPEC = Union[str, List[str], bool]

# mars levtypes that denote surface/single-level fields
_SURFACE_LEVTYPES = {"sfc", "o2d", "surface"}


def crack_variable_name(variable_name: str) -> Tuple[str, Optional[int]]:
    """Split ``q_850`` -> ("q", 850); names without a numeric suffix return
    (name, None). Ref variables_metadata.py:169 (_crack_variable_name)."""
    head, _, tail = variable_name.rpartition("_")
    if head and tail.isdigit():
        return head, int(tail)
    return variable_name, None


@dataclass
class VariableMetadata:
    """Per-variable metadata (subset of anemoi.transform Variable)."""

    name: str
    raw: dict = field(default_factory=dict)

    @classmethod
    def from_dict(cls, name: str, data: Optional[dict]) -> "VariableMetadata":
        return cls(name=name, raw=dict(data or {}))

    @property
    def _mars(self) -> dict:
        return self.raw.get("mars", {}) or {}

    @property
    def param(self) -> str:
        p = self._mars.get("param") or self.raw.get("param")
        if p is not None:
            return str(p)
        return crack_variable_name(self.name)[0]

    @property
    def level(self) -> Optional[int]:
        lvl = self._mars.get("levelist", self.raw.get("level"))
        if lvl is None:
            return None
        return int(lvl)

    @property
    def is_surface_level(self) -> bool:
        levtype = self._mars.get("levtype", self.raw.get("levtype"))
        if levtype is not None:
            return str(levtype) in _SURFACE_LEVTYPES
        return self.level is None

    @property
    def units(self) -> Optional[str]:
        return self.raw.get("units")

    @property
    def processing(self) -> Optional[list]:
        """Accumulation/processing period descriptors, if recorded."""
        return self.raw.get("process", self.raw.get("processing"))

    def __getattr__(self, key: str):
        # complex variable_groups specs match arbitrary metadata keys
        raw = object.__getattribute__(self, "raw")
        if key in raw:
            return raw[key]
        mars = raw.get("mars") or {}
        if key in mars:
            return mars[key]
        raise AttributeError(key)

    def compatible(
        self,
        other: "VariableMetadata",
        *,
        ignore_units: bool = False,
        ignore_processing_period: bool = False,
        return_reason: bool = False,
    ):
        """Structural compatibility with another variable's metadata."""
        reason = None
        if not ignore_units and self.units and other.units and self.units != other.units:
            reason = f"units differ: {self.units!r} vs {other.units!r}"
        elif (
            not ignore_processing_period
            and self.processing is not None
            and other.processing is not None
            and self.processing != other.processing
        ):
            reason = f"processing differs: {self.processing!r} vs {other.processing!r}"
        ok = reason is None
        return (ok, reason) if return_reason else ok


class ExtractVariableGroupAndLevel:
    """Extract (group, param, level) for a variable from the training config's
    ``variable_groups`` plus optional dataset variables_metadata.

    Group specs (ref variables_metadata.py:195-292):
    - simple: ``{"pl": ["q", "t", "u", "v", "w", "z"], "default": "sfc"}``
      — the variable's *param* (name without level) is matched against the list
    - complex: ``{"pl": {"levtype": "pl"}}`` — every key/value pair is matched
      against the variable's metadata attributes (requires metadata, except
      for the single key ``param`` which falls back to name-cracking)
    """

    def __init__(
        self,
        variable_groups: Dict[str, GROUP_SPEC],
        metadata_variables: Optional[Dict[str, Union[dict, VariableMetadata]]] = None,
    ) -> None:
        variable_groups = dict(variable_groups or {"default": "sfc"})
        if "default" not in variable_groups:
            raise ValueError("Default group not defined in variable_groups")
        self.default_group = variable_groups.pop("default")
        self.variable_groups = variable_groups
        self.metadata_variables: Dict[str, VariableMetadata] = {
            name: val if isinstance(val, VariableMetadata) else VariableMetadata.from_dict(name, val)
            for name, val in (metadata_variables or {}).items()
        }

    def get_group_specification(self, group_name: str) -> GROUP_SPEC:
        return self.variable_groups[group_name]

    def _is_metadata_trusted(self, variable_name: str) -> bool:
        """Metadata is trusted when its level/surface flags are consistent
        (ref :295-318): vertical-level variables carry a level, surface ones
        do not."""
        meta = self.metadata_variables.get(variable_name)
        if meta is None:
            return False
        return (not meta.is_surface_level) ^ (meta.level is None)

    def get_param(self, variable_name: str) -> str:
        if self._is_metadata_trusted(variable_name):
            return self.metadata_variables[variable_name].param
        return crack_variable_name(variable_name)[0]

    def get_level(self, variable_name: str) -> Optional[int]:
        if self._is_metadata_trusted(variable_name):
            return self.metadata_variables[variable_name].level
        return crack_variable_name(variable_name)[1]

    def get_group(self, variable_name: str) -> str:
        for group_name, spec in self.variable_groups.items():
            if isinstance(spec, (list, str)):
                params = spec if isinstance(spec, list) else [spec]
                if self.get_param(variable_name) in params:
                    return group_name
            elif isinstance(spec, dict):
                if variable_name not in self.metadata_variables:
                    if set(spec.keys()) != {"param"}:
                        raise ValueError(
                            f"Variable {variable_name} not found in metadata; complex "
                            f"variable_groups specs other than {{'param': ...}} need metadata."
                        )
                    params = spec["param"] if isinstance(spec["param"], list) else [spec["param"]]
                    if self.get_param(variable_name) in params:
                        return group_name
                else:
                    meta = self.metadata_variables[variable_name]
                    if all(
                        getattr(meta, key, None) in (val if isinstance(val, list) else [val])
                        for key, val in spec.items()
                    ):
                        return group_name
        return self.default_group

    def get_group_and_level(self, variable_name: str) -> Tuple[str, str, Optional[int]]:
        return (
            self.get_group(variable_name),
            self.get_param(variable_name),
            self.get_level(variable_name),
        )


def extract_variables_metadata_from_checkpoint(
    metadata: dict, dataset_names
) -> Optional[Dict[str, dict]]:
    """Pull per-dataset variables_metadata out of a checkpoint-bundle metadata
    dict (ref variables_metadata.py:23-35)."""
    dataset_meta = (metadata or {}).get("dataset", {})
    out = {}
    for name in dataset_names:
        vm = (dataset_meta.get(name) or {}).get("variables_metadata")
        if vm is not None:
            out[name] = vm
    return out or None


def check_variables_metadata_compatibility(
    ckpt_variables_metadata: Optional[Dict[str, dict]],
    dataset_metadata: Dict[str, dict],
    **options,
) -> None:
    """Unit/processing compatibility between checkpoint and current dataset
    variables (ref variables_metadata.py:38-98). Raises ValueError on
    mismatch; warns and skips when metadata is absent on either side."""
    if ckpt_variables_metadata is None:
        LOGGER.warning("Checkpoint has no variables_metadata; skipping unit compatibility check.")
        return
    for dataset_name, ckpt_vm in ckpt_variables_metadata.items():
        ds_vm = (dataset_metadata.get(dataset_name) or {}).get("variables_metadata")
        if ds_vm is None:
            LOGGER.warning(
                "Dataset %r has no variables_metadata; skipping unit compatibility check.",
                dataset_name,
            )
            continue
        for name, data in ckpt_vm.items():
            if name not in ds_vm:
                continue
            a = VariableMetadata.from_dict(name, data)
            b = VariableMetadata.from_dict(name, ds_vm[name])
            ok, reason = a.compatible(b, return_reason=True, **options)
            if not ok:
                raise ValueError(
                    f"Variable compatibility check failed for dataset {dataset_name!r}, "
                    f"variable {name!r}: {reason}"
                )


def check_loss_variable_units_compatibility(
    predicted_variables: List[str],
    target_variables: List[str],
    variables_metadata: Optional[Dict[str, dict]],
    **options,
) -> None:
    """When a loss maps predicted variables onto different target variables,
    verify each pair's units are compatible (ref variables_metadata.py:101-165)."""
    if variables_metadata is None:
        LOGGER.warning("No variables_metadata available; skipping loss variable unit check.")
        return
    if len(predicted_variables) != len(target_variables):
        raise ValueError("predicted and target variable lists differ in length")
    for pred, target in zip(predicted_variables, target_variables):
        if pred == target:
            continue
        if pred not in variables_metadata or target not in variables_metadata:
            LOGGER.warning("Variable pair (%s, %s) missing metadata; skipping unit check.", pred, target)
            continue
        a = VariableMetadata.from_dict(pred, variables_metadata[pred])
        b = VariableMetadata.from_dict(pred, variables_metadata[target])
        ok, reason = a.compatible(b, return_reason=True, **options)
        if not ok:
            raise ValueError(
                f"Loss variable mismatch: predicted {pred!r} and target {target!r} "
                f"are not compatible: {reason}"
            )

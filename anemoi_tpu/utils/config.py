"""Config system: YAML composition + dotted overrides + attribute access.

Replaces the reference's Hydra/OmegaConf stack (training/src/anemoi/training/config,
SURVEY.md §5.6) with a dependency-light equivalent:

- :class:`DotDict`      -- attribute-style nested dict (like anemoi.utils.config.DotDict)
- :func:`load_config`   -- load a YAML file, resolve ``defaults:`` composition
                           (Hydra-style include list) and apply dotlist overrides
- :func:`apply_overrides` -- ``a.b.c=value`` dotted assignment with YAML-typed values
"""

from __future__ import annotations

import copy
import os
from typing import Any, Dict, List, Optional

import yaml


class DotDict(dict):
    """Dict with attribute access, recursively wrapping nested dicts."""

    def __init__(self, *args: Any, **kwargs: Any) -> None:
        super().__init__(*args, **kwargs)
        for k, v in list(self.items()):
            self[k] = self._wrap(v)

    @classmethod
    def _wrap(cls, v: Any) -> Any:
        if isinstance(v, dict) and not isinstance(v, DotDict):
            return cls(v)
        if isinstance(v, (list, tuple)):
            return type(v)(cls._wrap(x) for x in v)
        return v

    def __getattr__(self, k: str) -> Any:
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k: str, v: Any) -> None:
        self[k] = self._wrap(v)

    def __setitem__(self, k: Any, v: Any) -> None:
        super().__setitem__(k, self._wrap(v))

    def __deepcopy__(self, memo: dict) -> "DotDict":
        return DotDict({k: copy.deepcopy(v, memo) for k, v in self.items()})

    def to_dict(self) -> Dict[str, Any]:
        def unwrap(v: Any) -> Any:
            if isinstance(v, DotDict):
                return {k: unwrap(x) for k, x in v.items()}
            if isinstance(v, dict):
                return {k: unwrap(x) for k, x in v.items()}
            if isinstance(v, (list, tuple)):
                return [unwrap(x) for x in v]
            return v

        return unwrap(self)


def deep_update(base: Dict[str, Any], override: Dict[str, Any]) -> Dict[str, Any]:
    """Recursively merge ``override`` into ``base`` (override wins); returns base."""
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(base.get(k), dict):
            deep_update(base[k], v)
        else:
            base[k] = v
    return base


def _parse_value(text: str) -> Any:
    try:
        value = yaml.safe_load(text)
    except yaml.YAMLError:
        return text
    if isinstance(value, str):
        # YAML 1.1 misses scientific floats like "1e-3"
        try:
            return float(value)
        except ValueError:
            return value
    return value


def apply_overrides(cfg: Dict[str, Any], overrides: List[str]) -> Dict[str, Any]:
    """Apply ``key.path=value`` dotted overrides (values parsed as YAML)."""
    for item in overrides:
        if "=" not in item:
            raise ValueError(f"Override must look like a.b.c=value, got: {item}")
        path, _, raw = item.partition("=")
        keys = path.strip().split(".")
        node = cfg
        for k in keys[:-1]:
            node = node.setdefault(k, {})
            if not isinstance(node, dict):
                raise TypeError(f"Cannot override through non-dict at '{k}' in '{path}'")
        node[keys[-1]] = _parse_value(raw)
    return cfg


def load_config(
    path: str,
    overrides: Optional[List[str]] = None,
    search_paths: Optional[List[str]] = None,
) -> DotDict:
    """Load a YAML config with Hydra-style ``defaults:`` composition.

    ``defaults`` is a list of either ``group/name`` strings (loaded from the file
    ``<dir>/<group>/<name>.yaml`` and merged under key ``group``) or ``{group: name}``
    single-entry mappings.  The special entry ``_self_`` controls where the file's
    own keys merge in (default: last).
    """
    search = list(search_paths or [])
    base_dir = os.path.dirname(os.path.abspath(path))
    if base_dir not in search:
        search.insert(0, base_dir)

    with open(path) as f:
        raw = yaml.safe_load(f) or {}

    defaults = raw.pop("defaults", None)
    if defaults is None:
        merged = raw
    else:
        merged: Dict[str, Any] = {}
        self_seen = False
        for entry in defaults:
            if entry == "_self_":
                deep_update(merged, raw)
                self_seen = True
                continue
            if isinstance(entry, dict):
                [(group, name)] = entry.items()
            else:
                group, _, name = str(entry).rpartition("/")
            sub = _find_and_load(group, str(name), search)
            if group:
                # nested groups like model/processor -> cfg["model"]["processor"]
                keys = group.split("/")
                node: Dict[str, Any] = merged
                for k in keys[:-1]:
                    node = node.setdefault(k, {})
                deep_update(node.setdefault(keys[-1], {}), sub)
            else:
                deep_update(merged, sub)
        if not self_seen:
            deep_update(merged, raw)

    if overrides:
        apply_overrides(merged, overrides)
    return DotDict(merged)


def _find_and_load(group: str, name: str, search: List[str]) -> Dict[str, Any]:
    rel = os.path.join(group, f"{name}.yaml") if group else f"{name}.yaml"
    for root in search:
        candidate = os.path.join(root, rel)
        if os.path.exists(candidate):
            # recursive load so groups can themselves have defaults
            sub = load_config(candidate, search_paths=search)
            return sub.to_dict()
    raise FileNotFoundError(f"Config group file not found: {rel} (searched {search})")


def save_config(cfg: Any, path: str) -> None:
    if isinstance(cfg, DotDict):
        cfg = cfg.to_dict()
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)

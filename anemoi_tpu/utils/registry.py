"""Component registry: the explicit replacement for the reference's Hydra
``_target_`` reflection (see /root/reference training/.../config; SURVEY.md §5.6).

Components (node builders, edge builders, losses, models, ...) register under a
string name; configs refer to them by that name.  This keeps the reference's
"everything is instantiable from config" property without runtime import
reflection, which plays badly with jit tracing and static typing.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterator, Optional


class Registry:
    """A named registry of factories."""

    def __init__(self, kind: str) -> None:
        self.kind = kind
        self._factories: Dict[str, Callable[..., Any]] = {}

    def register(self, name: Optional[str] = None) -> Callable:
        """Decorator: register a class or function under ``name`` (default: its __name__)."""

        def deco(obj: Callable) -> Callable:
            key = name or obj.__name__
            if key in self._factories and self._factories[key] is not obj:
                raise KeyError(f"{self.kind} registry already has '{key}'")
            self._factories[key] = obj
            return obj

        return deco

    def get(self, name: str) -> Callable[..., Any]:
        if name not in self._factories:
            known = ", ".join(sorted(self._factories))
            raise KeyError(f"Unknown {self.kind} '{name}'. Known: {known}")
        return self._factories[name]

    def build(self, name: str, /, *args: Any, **kwargs: Any) -> Any:
        return self.get(name)(*args, **kwargs)

    def build_from_config(self, config: Dict[str, Any], **extra: Any) -> Any:
        """Build from a ``{"name": ..., <kwargs>}`` mapping (like hydra _target_)."""
        cfg = dict(config)
        name = cfg.pop("name", None) or cfg.pop("_target_", None)
        if name is None:
            raise KeyError(f"{self.kind} config needs a 'name' key: {config}")
        return self.get(name)(**cfg, **extra)

    def __contains__(self, name: str) -> bool:
        return name in self._factories

    def __iter__(self) -> Iterator[str]:
        return iter(self._factories)

    def names(self) -> list[str]:
        return sorted(self._factories)

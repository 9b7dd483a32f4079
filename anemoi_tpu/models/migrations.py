"""Versioned checkpoint migrations.

Equivalent of /root/reference/models/src/anemoi/models/migrations/
(Migrator migrator.py:1-685 + timestamped scripts): ordered migration steps
with forward/rollback transforms, the applied-list stored inside the
checkpoint metadata so old checkpoints load on new code.

A migration is registered with a monotonically increasing id:

    @register_migration("1700000001_rename_mlp")
    def _m(ckpt):  # forward
        ...
    @_m.rollback
    def _m_down(ckpt):
        ...
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional


@dataclass
class Migration:
    name: str
    forward: Callable[[dict], dict]
    rollback_fn: Optional[Callable[[dict], dict]] = None

    def rollback(self, fn: Callable[[dict], dict]) -> Callable:
        """Decorator registering the down-migration."""
        self.rollback_fn = fn
        return fn


class Migrator:
    """Holds the ordered migration list and applies the missing ones."""

    def __init__(self) -> None:
        self.migrations: List[Migration] = []

    def register(self, name: str) -> Callable:
        assert not self.migrations or name > self.migrations[-1].name, (
            "migration names must be registered in increasing order "
            f"('{name}' after '{self.migrations[-1].name if self.migrations else ''}')"
        )

        def deco(fn: Callable[[dict], dict]) -> Migration:
            mig = Migration(name=name, forward=fn)
            self.migrations.append(mig)
            return mig

        return deco

    def applied(self, ckpt: dict) -> List[str]:
        return list(ckpt.get("metadata", {}).get("migrations", []))

    def pending(self, ckpt: dict) -> List[Migration]:
        done = set(self.applied(ckpt))
        return [m for m in self.migrations if m.name not in done]

    def migrate(self, ckpt: dict) -> dict:
        """Apply all pending migrations in order; records the applied list."""
        ckpt = dict(ckpt)
        done = list(ckpt.get("metadata", {}).get("migrations", []))
        for mig in self.pending(ckpt):
            ckpt = mig.forward(ckpt)
            done.append(mig.name)
        meta = dict(ckpt.get("metadata", {}))  # after: migrations may edit it
        meta["migrations"] = done
        ckpt["metadata"] = meta
        return ckpt

    def rollback_to(self, ckpt: dict, target: str) -> dict:
        """Undo migrations applied after ``target`` (inclusive order)."""
        ckpt = dict(ckpt)
        meta = dict(ckpt.get("metadata", {}))
        done = list(meta.get("migrations", []))
        by_name = {m.name: m for m in self.migrations}
        while done and done[-1] > target:
            name = done.pop()
            mig = by_name.get(name)
            if mig is None or mig.rollback_fn is None:
                raise RuntimeError(f"migration '{name}' has no rollback")
            ckpt = mig.rollback_fn(ckpt)
        meta["migrations"] = done
        ckpt["metadata"] = meta
        return ckpt


# The framework-global migrator; future format changes register here.
MIGRATOR = Migrator()
register_migration = MIGRATOR.register


@register_migration("20260817000000_initial_format")
def _initial(ckpt: dict) -> dict:
    """Format version stamp for round-1 checkpoints (no-op transform)."""
    meta = dict(ckpt.get("metadata", {}))
    meta.setdefault("format_version", 1)
    ckpt = dict(ckpt)
    ckpt["metadata"] = meta
    return ckpt


@_initial.rollback
def _initial_down(ckpt: dict) -> dict:
    meta = dict(ckpt.get("metadata", {}))
    meta.pop("format_version", None)
    ckpt = dict(ckpt)
    ckpt["metadata"] = meta
    return ckpt

"""Provenance capture: the full software/hardware environment of a run.

Equivalent of the reference's `gather_provenance_info` usage at
/root/reference/training/src/anemoi/training/train/train.py:513 (from
anemoi-utils): record python/package versions, git state, platform and
device info into checkpoint metadata and the experiment tracker so any
artefact can be traced back to the exact environment that produced it.
"""

from __future__ import annotations

import os
import platform
import subprocess
import sys
import time
from typing import Any, Dict

#: packages whose versions matter for reproducing a run
_CORE_PACKAGES = (
    "jax", "jaxlib", "flax", "optax", "orbax-checkpoint", "chex", "numpy",
    "scipy", "einops", "anemoi-tpu",
)

#: env vars that change numerical or execution behaviour
_ENV_KEYS = ("JAX_PLATFORMS", "XLA_FLAGS", "LIBTPU_INIT_ARGS", "ANEMOI_BASE_SEED")


def _git_info(path: str) -> Dict[str, Any]:
    def run(*args: str) -> str:
        return subprocess.run(
            ["git", *args], cwd=path, capture_output=True, text=True, timeout=10
        ).stdout.strip()

    try:
        commit = run("rev-parse", "HEAD")
        if not commit:
            return {}
        return {
            "commit": commit,
            "branch": run("rev-parse", "--abbrev-ref", "HEAD"),
            "dirty": bool(run("status", "--porcelain")),
        }
    except Exception:  # git absent / not a repo / timeout
        return {}


def gather_provenance_info(full_pip: bool = False) -> Dict[str, Any]:
    """Environment snapshot: versions, git state, platform, devices, env.

    ``full_pip`` additionally records every installed distribution (the
    reference's pip-freeze equivalent); default keeps the core packages only
    to bound metadata size.
    """
    from importlib import metadata

    def version_of(name: str) -> str:
        try:
            return metadata.version(name)
        except metadata.PackageNotFoundError:
            return "not-installed"

    info: Dict[str, Any] = {
        "time": time.strftime("%Y-%m-%dT%H:%M:%S%z"),
        "python": sys.version.split()[0],
        "executable": sys.executable,
        "platform": platform.platform(),
        "hostname": platform.node(),
        "packages": {name: version_of(name) for name in _CORE_PACKAGES},
        "env": {k: os.environ[k] for k in _ENV_KEYS if k in os.environ},
    }
    if full_pip:
        info["pip_freeze"] = {
            dist.metadata["Name"]: dist.version
            for dist in metadata.distributions()
            if dist.metadata["Name"]
        }
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    git = _git_info(os.path.dirname(pkg_root))
    if git:
        info["git"] = git
    try:  # only if a backend is already up — never force initialisation here
        import jax

        info["devices"] = {
            "backend": jax.default_backend(),
            "count": jax.device_count(),
            "kind": jax.devices()[0].device_kind if jax.devices() else None,
            "process_count": jax.process_count(),
        }
    except Exception:
        pass
    return info

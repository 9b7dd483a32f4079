"""AOT-compiled executable cache for serving cold starts.

The axon/TPU compile service takes O(minutes) for flagship-size programs and
ignores JAX's persistent compilation cache, so every serving cold start used
to pay the full compile (docs/performance.md "Compile time").  This module
serializes the COMPILED executable (``jax.experimental.serialize_executable``,
i.e. the PJRT executable bytes + in/out pytree defs) to disk, keyed by
everything that determines it, and reloads it in a fresh process without
touching the compiler.

Measured on the axon chip (tools: /tmp AOT experiment, round 5): a fresh
process reloads a 6 MB payload in 0.08 s and the first call returns
bit-identical outputs, vs ~5 s (o32 toy) to 100+ s (flagship) of compile.

The key hashes: jax+jaxlib versions, device kind and count, the abstract
shapes/dtypes of every argument leaf, and caller-supplied context (model
config); any mismatch is a clean cache miss.  Payloads are NOT portable
across toolchain versions -- deserialization failures fall back to a fresh
compile and overwrite the entry.
"""

from __future__ import annotations

import hashlib
import json
import logging
import os
import pickle
from typing import Any, Callable, Optional, Tuple

LOG = logging.getLogger(__name__)


def _abstract_signature(args: Tuple[Any, ...]) -> str:
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(args)
    sig = [str(treedef)]
    for leaf in leaves:
        shape = getattr(leaf, "shape", None)
        dtype = getattr(leaf, "dtype", type(leaf).__name__)
        sig.append(f"{shape}:{dtype}")
    return "|".join(sig)


def cache_key(args: Tuple[Any, ...], context: Any = None) -> str:
    import jax

    device = jax.devices()[0]
    parts = json.dumps(
        {
            "jax": jax.__version__,
            "jaxlib": getattr(__import__("jaxlib"), "__version__", "?"),
            "device_kind": device.device_kind,
            "platform": device.platform,
            "n_devices": jax.device_count(),
            "args": _abstract_signature(args),
            "context": context,
        },
        sort_keys=True, default=str,
    )
    return hashlib.sha256(parts.encode()).hexdigest()[:32]


def load_or_compile(
    jitted: Callable,
    args: Tuple[Any, ...],
    cache_dir: Optional[str],
    context: Any = None,
) -> Callable:
    """Return a loaded compiled executable for ``jitted(*args)``.

    With ``cache_dir`` set, tries ``<dir>/<key>.jaxexec`` first (0.1 s-class
    reload, no compiler involved); otherwise (or on any failure) compiles,
    then serializes the result into the cache for the next cold start.
    The returned callable takes the same positional args."""
    if cache_dir is None:
        return jitted.lower(*args).compile()
    from jax.experimental import serialize_executable

    key = cache_key(args, context=context)
    path = os.path.join(cache_dir, f"{key}.jaxexec")
    if os.path.exists(path):
        try:
            import jax

            with open(path, "rb") as f:
                payload, in_tree, out_tree = pickle.load(f)
            fn = serialize_executable.deserialize_and_load(payload, in_tree, out_tree)
            # validation/warmup call: XLA:CPU AOT occasionally restores an
            # executable that only fails at dispatch (machine-feature drift);
            # materialize one result before trusting the entry.  Doubles as
            # the serving warmup step.
            jax.block_until_ready(fn(*args))
            LOG.info("AOT cache hit: %s", path)
            return fn
        except Exception as err:  # toolchain drift etc: recompile + refresh
            LOG.warning("AOT cache entry %s unusable (%s); recompiling", path, err)
    compiled = jitted.lower(*args).compile()
    try:
        payload, in_tree, out_tree = serialize_executable.serialize(compiled)
        os.makedirs(cache_dir, exist_ok=True)
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            pickle.dump((payload, in_tree, out_tree), f)
        os.replace(tmp, path)
        LOG.info("AOT cache store: %s (%.1f MB)", path, len(payload) / 2**20)
    except Exception as err:  # never fail serving on cache trouble
        LOG.warning("AOT executable serialization failed (%s); cache skipped", err)
    return compiled

"""Persistent XLA compilation cache for every CLI entry point.

The reference has no compile step to amortize; here every jitted graph (the
full tree forward behind CEM planning is the expensive one — tens of minutes
to build on a 1-core host) is serialized to disk so reruns, resumed control
benchmarks, and repeated tasks skip XLA entirely. Safe to call any time
before the first compile; later calls are no-ops.
"""
from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/jax_compile_cache")
_enabled = False


def enable_persistent_compile_cache(path: str | None = None) -> None:
    global _enabled
    if _enabled:
        return
    import jax

    cache_dir = (path or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or _DEFAULT_DIR)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # 0.0: cache even tiny graphs — through the remote-TPU tunnel every
        # avoided compile saves a multi-second roundtrip
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        _enabled = True
    except Exception:
        pass  # older jax or read-only FS: run without the persistent cache

"""Persistent XLA compilation cache.

First compiles on the tunneled TPU take minutes (remote compile on a 1-core
host); the persistent cache makes every subsequent process start warm.
Enabled by bench.py, the CLI entries, and __graft_entry__."""
from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    try:
        if jax.default_backend() == "cpu":
            # CPU AOT cache entries embed machine features and warn/SIGILL
            # when the compile and run hosts differ; not worth caching.
            return
    except Exception:
        return
    default = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")
    path = path or os.environ.get("ZUTIS_JAX_CACHE_DIR", default)
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # older jax without these flags

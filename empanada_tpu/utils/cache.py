"""JAX persistent compilation cache helper.

This deployment environment compiles TPU programs through a network
tunnel (remote compile), so cold compiles of the large fused graphs take
minutes. Every entry point enables the on-disk cache so each program
compiles once per machine; the cache ships with the repo
(.jax_cache, primed for the benchmark shapes).
"""

from __future__ import annotations

import os

__all__ = ["enable_compilation_cache"]

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_compilation_cache(cache_dir=None):
    import jax

    cache_dir = cache_dir or os.environ.get(
        "EMPANADA_JAX_CACHE", _DEFAULT_DIR)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update(
            "jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # older jax without these flags
    return cache_dir

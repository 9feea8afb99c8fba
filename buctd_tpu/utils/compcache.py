"""Persistent XLA compilation cache.

Compiles through the axon relay are slow (100-200+ s for the full models); the
persistent cache cuts repeat compiles across processes to seconds.  Enabled by all
entry points (tools/, bench.py, __graft_entry__).  Override the location with
BUCTD_COMPILATION_CACHE (empty string disables).
"""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> str | None:
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get("BUCTD_COMPILATION_CACHE",
                                   os.path.expanduser("~/.cache/jax_comp_cache"))
    if not cache_dir:
        return None
    try:
        # TPU only: XLA:CPU AOT results are machine-feature specific and a cache
        # entry compiled on one host can SIGILL on another (observed warning)
        if jax.default_backend() == "cpu":
            return None
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        return None
    return cache_dir

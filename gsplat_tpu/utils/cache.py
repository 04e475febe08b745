"""Persistent XLA compilation cache.

On remote-attached TPUs a compile costs minutes of tunnel round-trips; the
reference pays nothing comparable (its CUDA kernels are precompiled by
setup.py).  The JAX persistent cache keys compiled executables by HLO hash,
so budget-ladder recompiles survive process restarts and the 27-coeff SH
graph compiles at most once per machine.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Enable the persistent compilation cache (idempotent)."""
    import jax

    d = cache_dir or os.environ.get("GSPLAT_JAX_CACHE", _DEFAULT_DIR)
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    # splat graphs are many small-to-medium executables; cache all of them
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return d

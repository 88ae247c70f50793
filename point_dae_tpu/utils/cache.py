"""Persistent XLA compilation cache (compiled executables keyed by HLO).

First compile of the flagship train step costs minutes through the TPU
compile service; the cache makes reruns of bench/CLI/driver entry points
near-instant. Call once before the first jit execution.
"""
from __future__ import annotations

import os


def enable_compilation_cache(path: str = None) -> None:
    import jax

    path = path or os.environ.get("PDAE_JAX_CACHE",
                                  os.path.expanduser("~/.cache/pdae_jax"))
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass  # older jax without the knobs

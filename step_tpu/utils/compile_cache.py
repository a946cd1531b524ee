"""Persistent XLA compilation cache.

XLA-CPU compiles of the detector are slow (~45 s for even a tiny config's
init program); the persistent cache turns repeat runs into ~5 s loads. Used
by tests, bench.py, and the driver entry points. The TPU path benefits too
(remote compiles of the full detector measured at 7+ min cold).
"""

from __future__ import annotations

import os

import jax

DEFAULT_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".jax_cache")


def enable_compile_cache(path: str | None = None) -> str:
    path = path or os.environ.get("STEP_TPU_JAX_CACHE", DEFAULT_CACHE_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path

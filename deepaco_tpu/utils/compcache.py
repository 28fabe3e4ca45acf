"""Persistent XLA compilation cache.

Matrix telemetry (VERDICT r3 weak #6) showed per-process overhead dominating
many protocol cells — e.g. rcpsp30-neural at 511 s wall for 29 s of device
work — because every fresh process re-compiles identical device programs.
Entry points (CLI, bench, matrix runner) call :func:`enable` once before any
jit; compiled executables then persist under ``<repo>/.jax_cache`` across
processes. Override the location with ``JAX_COMPILATION_CACHE_DIR``; set it
empty to disable.
"""
from __future__ import annotations

import os


def enable() -> None:
    if "JAX_COMPILATION_CACHE_DIR" in os.environ \
            and not os.environ["JAX_COMPILATION_CACHE_DIR"]:
        return
    import jax

    cache = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.abspath(cache))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax without the persistent-cache config knobs

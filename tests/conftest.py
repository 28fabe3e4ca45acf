"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

Multi-chip sharding code is written against ``jax.sharding.Mesh`` and must be
device-count agnostic; tests validate it on a virtual 8-device CPU backend
(SURVEY §4 — the reference has no distributed tests; this harness is new).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (import after env is set)

# The environment's sitecustomize pins JAX_PLATFORMS to the TPU plugin; the
# config update below (before any backend is touched) overrides it so tests
# run on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Checkpoint-parity tests compare against torch fp32; keep matmuls full fp32.
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compile cache: the suite is compile-bound on the CPU backend.
jax.config.update("jax_compilation_cache_dir", "/tmp/deepaco_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

Multi-chip sharding code is written against ``jax.sharding.Mesh`` and must be
device-count agnostic; tests validate it on a virtual 8-device CPU backend
(SURVEY §4 — the reference has no distributed tests; this harness is new).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (import after env is set)

jax.config.update("jax_enable_x64", False)
# Checkpoint-parity tests compare against torch fp32; keep matmuls full fp32.
jax.config.update("jax_default_matmul_precision", "highest")

"""Test configuration: force an 8-device virtual CPU platform so sharding
and collective tests run without TPU hardware (SURVEY.md §4).

The environment's sitecustomize pins JAX_PLATFORMS=axon (the TPU tunnel),
so we must override unconditionally — env var AND jax.config — before any
backend initialization.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# CLI mains enable the persistent XLA compilation cache; keep test runs
# hermetic (and their logs clean of CPU AOT-loader chatter).
os.environ.setdefault("PRD_NO_COMPILATION_CACHE", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

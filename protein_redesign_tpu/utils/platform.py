"""Platform-override hook for CLI subprocesses.

On hosts whose sitecustomize pins a JAX platform (the axon TPU tunnel in
this environment), the ``JAX_PLATFORMS`` env var alone does NOT win — the
pin's plugin registration reasserts the platform — so a subprocess that
wants the CPU backend (tiny-model smoke runs, CI-style drives) needs an
in-process ``jax.config`` override before backend initialization.
``tests/conftest.py`` does the same for pytest; ``PRD_PLATFORM=cpu`` is
the CLI equivalent.
"""

from __future__ import annotations

import os

import jax


def apply_platform_override() -> None:
    """Honor ``PRD_PLATFORM`` (e.g. ``cpu``) before any backend init."""
    plat = os.environ.get("PRD_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)

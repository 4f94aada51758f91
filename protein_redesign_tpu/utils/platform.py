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
    """Honor ``PRD_PLATFORM`` (e.g. ``cpu``) before any backend init.

    Companions for multi-process CPU runs (tests/test_multihost.py
    drives the REAL 2-process path this way — gloo collectives over
    localhost):

    - ``PRD_CPU_DEVICES=n``: n virtual CPU devices per process
      (``jax_num_cpu_devices``; unlike XLA_FLAGS it composes with a
      parent pytest env that already forces a different count).
    - ``PRD_CPU_COLLECTIVES=gloo|mpi``: cross-process CPU collective
      implementation (``jax_cpu_collectives_implementation``) — without
      it, multi-process CPU ``jax.distributed`` has no transport.
    """
    plat = os.environ.get("PRD_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    n_cpu = os.environ.get("PRD_CPU_DEVICES")
    if n_cpu:
        jax.config.update("jax_num_cpu_devices", int(n_cpu))
    coll = os.environ.get("PRD_CPU_COLLECTIVES")
    if coll:
        jax.config.update("jax_cpu_collectives_implementation", coll)

"""Persistent XLA compilation cache.

Remote-TPU compiles of the scan-based samplers/train steps cost minutes
per program, and every CLI invocation is a fresh process (the reference's
Lightning scripts have the same shape, `train.py:26-50`). Enabling JAX's
persistent compilation cache makes the second invocation of any CLI with
the same model/bucket configuration start in seconds.

Opt-out with PRD_NO_COMPILATION_CACHE=1; override the location with
PRD_COMPILATION_CACHE_DIR.
"""

from __future__ import annotations

import os
from pathlib import Path

_DEFAULT_DIR = "~/.cache/protein_redesign_tpu/xla"


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX at an on-disk compilation cache. Returns the directory,
    or None when disabled (env opt-out or unsupported JAX)."""
    if os.environ.get("PRD_NO_COMPILATION_CACHE"):
        return None
    path = Path(
        cache_dir
        or os.environ.get("PRD_COMPILATION_CACHE_DIR", _DEFAULT_DIR)
    ).expanduser()
    import jax

    try:
        path.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(path))
        # Cache everything that took meaningful compile time; the default
        # threshold skips sub-second programs, which is what we want.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # pragma: no cover - old jax or read-only FS
        return None
    return str(path)

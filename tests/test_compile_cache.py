"""Persistent-compilation-cache helper (`utils/compile_cache.py`)."""

import os

import jax


def test_opt_out_env(monkeypatch, tmp_path):
    from protein_redesign_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    monkeypatch.setenv("PRD_NO_COMPILATION_CACHE", "1")
    assert enable_compilation_cache(str(tmp_path / "cc")) is None
    assert not (tmp_path / "cc").exists()


def test_enable_sets_config_and_creates_dir(monkeypatch, tmp_path):
    from protein_redesign_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    monkeypatch.delenv("PRD_NO_COMPILATION_CACHE", raising=False)
    prev = jax.config.jax_compilation_cache_dir
    try:
        d = enable_compilation_cache(str(tmp_path / "cc"))
        assert d == str(tmp_path / "cc")
        assert os.path.isdir(d)
        assert jax.config.jax_compilation_cache_dir == d
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_env_dir_override(monkeypatch, tmp_path):
    from protein_redesign_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    monkeypatch.delenv("PRD_NO_COMPILATION_CACHE", raising=False)
    monkeypatch.setenv("PRD_COMPILATION_CACHE_DIR", str(tmp_path / "env_cc"))
    prev = jax.config.jax_compilation_cache_dir
    try:
        assert enable_compilation_cache() == str(tmp_path / "env_cc")
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)

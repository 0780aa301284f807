"""Persistent compilation cache plumbing (`cpc2_tpu/utils/cache.py`)."""

import os

import jax
import jax.numpy as jnp

from cpc2_tpu.utils.cache import enable_compilation_cache


def test_enable_compilation_cache(tmp_path, monkeypatch):
    target = str(tmp_path / "xla_cache")
    monkeypatch.setenv("CPC2_COMPILATION_CACHE", target)
    path = enable_compilation_cache()
    assert path == target
    assert os.path.isdir(target)
    assert jax.config.jax_compilation_cache_dir == target
    # compile something so an entry is (potentially) written; must not raise
    jax.jit(lambda x: x * 2 + 1)(jnp.arange(8.0)).block_until_ready()


def test_explicit_path_overrides_env(tmp_path, monkeypatch):
    monkeypatch.setenv("CPC2_COMPILATION_CACHE", str(tmp_path / "env"))
    explicit = str(tmp_path / "explicit")
    assert enable_compilation_cache(explicit) == explicit
    assert os.path.isdir(explicit)

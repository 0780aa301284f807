"""Persistent XLA compilation cache.

Accelerator compiles can be slow (remote AOT services, large programs);
training/eval entry points call `enable_compilation_cache()` so every
program is compiled once per machine, not once per process. Cache location:
$CPC2_COMPILATION_CACHE or ~/.cache/cpc2_tpu/xla.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> str | None:
    import jax
    path = path or os.environ.get(
        'CPC2_COMPILATION_CACHE',
        os.path.join(os.path.expanduser('~'), '.cache', 'cpc2_tpu', 'xla'))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', path)
        # Cache only expensive programs (the jitted train/val bodies take
        # minutes on remote-compile backends). Caching every tiny op bloats
        # the dir and, on the CPU backend, each entry whose AOT machine
        # features mismatch the host logs a large load-failure warning.
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
        return path
    except Exception as e:  # unsupported backend/config: stay functional
        print(f"(compilation cache disabled: {e})")
        return None

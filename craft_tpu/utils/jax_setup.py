"""Process-level JAX setup: persistent compilation cache + platform helpers."""

from __future__ import annotations

import os


def setup_jax(cache_dir: str = "/root/.cache/jax_comp_cache",
              force_cpu: bool = False):
    import jax

    if force_cpu:
        jax.config.update("jax_platforms", "cpu")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
    return jax

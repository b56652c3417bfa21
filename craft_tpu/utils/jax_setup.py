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


def train_compiler_options():
    """Backend-compiler options for the TRAIN step jit (None off-TPU —
    the options are TPU-compiler flags the CPU backend would reject).

    xla_tpu_scoped_vmem_limit_kib=65536: the default 16 MB scoped-VMEM
    budget both (a) rejects the backward dropout-mask fusion of the
    probs_vjp training path (XLA picks a ~16.6 MB tile workspace for the
    rng-bits + softmax-VJP kOutput fusion and then refuses its own choice)
    and (b) measurably costs throughput — the r3 A/B measured 414.8 vs
    464.3 ms/step at the chairs config with 64 MB (tools/bench_train_ab.py
    'vmem64').  128 KiB granularity; 64 MB is VMEM-safe on v5e (128 MB
    physical)."""
    import jax

    if jax.default_backend() != "tpu":
        return None
    return {"xla_tpu_scoped_vmem_limit_kib": "65536"}

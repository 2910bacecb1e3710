"""Persistent XLA compilation cache setup (compiles are host-bound and this
host has few cores; cache hits skip them entirely on reruns)."""

import os

import jax


def enable_compilation_cache(path: str = None):
    path = path or os.path.expanduser("~/.cache/sdformerflow_xla")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass

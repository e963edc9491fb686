"""Persistent XLA compilation cache.

On the tunneled TPU platform the first nontrivial compile in a process
pays a multi-minute one-time service cost (measured ~110-320 s for the
first fused jit, ~0.5 s for every subsequent compile of the same or
larger HLOs).  JAX's persistent compilation cache amortizes this across
processes: a warm-cache process solves in ~3 s wall.  Every CLI / bench /
driver entry point calls :func:`enable_persistent_cache` first.
"""

from __future__ import annotations

import os


def default_cache_dir() -> str:
    env = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if env:
        return env
    return os.path.join(os.path.expanduser("~"), ".cache",
                        "pqp_for_mpc_tpu", "jax")


def enable_persistent_cache(path: str | None = None) -> str:
    """Point JAX's persistent compilation cache at ``path`` (created if
    needed).  Safe to call multiple times and after backend init."""
    import jax

    path = path or default_cache_dir()
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path

"""JAX runtime configuration for the proving framework.

Enables the persistent compilation cache: the proof kernels (field conv
chains, 253-step scalar-mult scans) produce large XLA graphs whose first
compile is expensive; caching makes every later process start warm.
Importing any :mod:`bulletproofs_r1cs_gadgets_tpu.ops` module applies this.
"""

from __future__ import annotations

import os

import jax

_APPLIED = False


def configure() -> None:
    global _APPLIED
    if _APPLIED:
        return
    cache_dir = os.environ.get(
        "BPTPU_JAX_CACHE",
        os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache"),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax versions: soldier on without the cache
    _APPLIED = True


configure()

"""Persistent XLA/Mosaic compilation cache.

The fully-unrolled Pallas kernels compile in minutes (the shellwalk
triangle kernel ~7 min through the axon remote-compile service); the JAX
persistent cache cuts a warm process start to ~1/5 of that (measured
334 s -> 75 s for the sphere step). Harness entry points (bench,
__graft_entry__, tests) opt in; interactive sessions can too.

Must be called before the first JAX computation (backend init is fine).
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.join(os.path.dirname(__file__), "..", "..",
                           ".jax_cache")


def enable(cache_dir: str | None = None) -> None:
    import jax
    path = os.path.abspath(cache_dir or DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

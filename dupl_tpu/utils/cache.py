"""Persistent XLA compilation cache.

Remote compilation through the TPU relay costs minutes for the big jitted
programs (full train step, bench pipeline); the persistent cache brings repeat
runs down to seconds.  Call :func:`enable_compilation_cache` before the first
jit execution (safe to call multiple times)."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "DUPL_TPU_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache"),
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimisation, never a requirement

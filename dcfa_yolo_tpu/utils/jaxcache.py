"""Persistent XLA compilation cache setup.

Full-model train-step compiles take minutes on remote-compile platforms; the
persistent cache makes every CLI invocation after the first start instantly.
"""

from __future__ import annotations

import os


def enable_persistent_cache(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "DCFA_JAX_CACHE", os.path.expanduser("~/.cache/dcfa_yolo_tpu_jax"))
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these options

"""Persistent XLA compilation cache.

The device-resident keyframe step is one large jitted program; its first
compile costs minutes.  The persistent cache makes that a one-time cost per
machine instead of per process.
"""
from __future__ import annotations

import os

_DEFAULT = os.path.join(os.path.expanduser("~"), ".cache", "boxfusion_tpu_xla")
_enabled = False


def enable_compilation_cache(path: str | None = None) -> None:
    global _enabled
    if _enabled:
        return
    import jax

    cache_dir = path or os.environ.get("BOXFUSION_XLA_CACHE", _DEFAULT)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _enabled = True

"""Persistent XLA compilation cache.

This host compiles XLA programs on a single CPU core; the RN50 triplet
train-step takes minutes to build. Caching compiled executables on disk
makes every subsequent CLI run, benchmark, and driver check start hot.
"""

from __future__ import annotations

import os
from pathlib import Path

_DEFAULT = Path(os.environ.get("ART_SBIR_CACHE", "~/.cache/art_sbir_tpu_xla"))
_enabled = False


def enable_compilation_cache(path: Path | str | None = None) -> None:
    global _enabled
    if _enabled:
        return
    import jax

    cache_dir = Path(path or _DEFAULT).expanduser()
    cache_dir.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _enabled = True

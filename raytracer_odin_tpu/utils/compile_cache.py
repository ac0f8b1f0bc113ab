"""Persistent XLA compilation cache.

First compiles of the 1080p render step take minutes through the TPU
tunnel; caching them on disk makes every later run (benchmarks, CLI
renders) start in seconds.
"""

from __future__ import annotations

import os
from pathlib import Path

_DEFAULT_DIR = Path(__file__).resolve().parents[2] / ".jax_cache"


def enable(cache_dir=None) -> None:
    import jax

    d = Path(cache_dir or os.environ.get("RT_TPU_CACHE_DIR", _DEFAULT_DIR))
    try:
        d.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(d))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax or read-only fs: carry on uncached

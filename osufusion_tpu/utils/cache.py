"""Persistent XLA compilation cache setup.

First compiles of the full train step / sampler are expensive (minutes on a
remote-compile TPU link); the persistent cache makes every subsequent process
start instantly for unchanged programs. Entry points call this before building
any jitted function.
"""

from __future__ import annotations

import os
from pathlib import Path

import jax

DEFAULT_CACHE_DIR = os.environ.get("OSUFUSION_JAX_CACHE", str(Path.home() / ".cache" / "osufusion_jax"))


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    path = Path(cache_dir or DEFAULT_CACHE_DIR)
    path.mkdir(parents=True, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", str(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - older jax without these flags
        pass

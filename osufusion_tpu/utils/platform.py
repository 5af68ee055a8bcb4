"""Honor an explicit JAX_PLATFORMS env var in CLI entry points.

This environment's sitecustomize registers the TPU backend and pins
``jax_platforms`` via jax.config *before* any entry point runs, so the
standard ``JAX_PLATFORMS=cpu python trainer.py ...`` has no effect — the
config pin wins over the env var. Every CLI calls this first so an explicit
env choice (CPU smoke runs, the virtual 8-device mesh recipe in README.md)
is restored; without the env var set, the ambient pin is left alone.
tests/conftest.py does the same re-pin for the test suite.
"""

from __future__ import annotations

import os


def pin_platform_from_env() -> None:
    platforms = os.environ.get("JAX_PLATFORMS")
    if not platforms:
        return
    import jax

    jax.config.update("jax_platforms", platforms)
    try:  # drop any backend the site hook already materialized
        jax.extend.backend.clear_backends()
    except Exception:
        pass

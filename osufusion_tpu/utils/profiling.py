"""Trace annotation helpers.

The reference wraps module forwards in ``torch.profiler.record_function``
scopes, disabled by a DEBUG env flag (reference modules/unet.py:15,:72-74,
residual.py:11,:35-37). TPU equivalent: ``jax.named_scope`` annotations with
the same scope names — they show up in XLA HLO op metadata and in
``jax.profiler`` traces — plus a context manager around ``jax.profiler`` for
capturing device traces.

Set ``OSUFUSION_DEBUG=1`` to turn annotations into no-ops (matching the
reference's DEBUG semantics).
"""

from __future__ import annotations

import contextlib
import os
from pathlib import Path

import jax

DEBUG = bool(os.environ.get("OSUFUSION_DEBUG") or os.environ.get("DEBUG"))


def named_scope(name: str):
    """jax.named_scope unless DEBUG disables annotation."""
    if DEBUG:
        return contextlib.nullcontext()
    return jax.named_scope(name)


@contextlib.contextmanager
def profile_trace(log_dir: str | Path = "/tmp/osufusion_trace"):
    """Capture a device trace viewable in TensorBoard/XProf."""
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()

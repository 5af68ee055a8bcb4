"""AOT-serialized sampler executables: kill the per-process serving cold start.

The persistent XLA compile cache (utils/cache.py) already collapses COMPILE
time for a warm program to blob-deserialization (~4 s measured on the TPU
backend), but every process still pays host-side TRACING of the sampler scan
— 38-63 s on this 1-core host (bench_results/r04_cache_proof_*.json). The
reference serves interactively from a long-lived Gradio process (reference
inference_gradio.py:173-249) and never re-traces; a TPU-native serving story
needs process restarts to be cheap too.

``jax.export`` fixes the right half: tracing + lowering runs ONCE (at
training's end, or on the first serve), the resulting StableHLO module is
serialized to disk keyed on everything that shapes the program — model
config, batch, padded length, step count, sampler, CFG scale — and any later
process deserializes it (milliseconds). No Python tracing of the model ever
runs again.

The XLA COMPILE of the deserialized module, however, is NOT served by the
persistent compilation cache: the cache key of a ``jit(exported.call)``
program is process-dependent (measured: three processes compiling the
identical artifact produced three distinct ``jit_call-*`` keys, each paying
the full ~63 s remote compile). So alongside the StableHLO we persist the
COMPILED EXECUTABLE itself (``jax.experimental.serialize_executable`` — the
same PJRT executable-serialization machinery a compile-cache hit uses, keyed
by OUR config digest instead of XLA's): a later process deserializes the
binary and runs, paying neither trace nor compile. The StableHLO artifact is
kept as the portable fallback (executable blobs are chip/runtime-specific).

Usage::

    from osufusion_tpu.serve.aot import load_or_export_sampler
    run = load_or_export_sampler(model, params, a.shape, steps=16,
                                 sampler="dpmpp-2m", cond_scale=2.0)
    out = run(params, a, c, x0)

Set ``OSUFUSION_AOT_DIR`` to relocate the artifact directory (default
``~/.cache/osufusion_aot``).
"""

from __future__ import annotations

import hashlib
import json
import os
from pathlib import Path
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import export as jax_export

DEFAULT_AOT_DIR = os.environ.get("OSUFUSION_AOT_DIR", str(Path.home() / ".cache" / "osufusion_aot"))


def _sampler_key(model, batch: int, padded: int, steps: int, sampler: str, cond_scale: float) -> str:
    """Filename-safe digest of everything that shapes the compiled program.

    The model config (dataclass JSON) covers architecture + dtypes; the
    platform matters because an exported module records its lowering
    platform. Params VALUES are runtime inputs, not part of the key."""
    import dataclasses

    payload = {
        "model": dataclasses.asdict(model.model_cfg),
        "diffusion": dataclasses.asdict(model.cfg),
        "cls": type(model).__name__,
        "batch": batch,
        "padded": padded,
        "steps": steps,
        "sampler": sampler,
        "cond_scale": cond_scale,
        "platform": jax.default_backend(),
        "jax": jax.__version__,
    }
    digest = hashlib.sha256(json.dumps(payload, sort_keys=True, default=str).encode()).hexdigest()[:20]
    return f"sampler_{sampler}{steps}_b{batch}_n{padded}_{digest}"


def _sample_fn(model, steps: int, sampler: str, cond_scale: float) -> Callable:
    def fn(params, a, c, x):
        return type(model).sample.__wrapped__(  # the underlying method; export re-jits
            model, params, a, c, x=x, cond_scale=cond_scale, sampling_timesteps=steps, method=sampler
        )

    return fn


def export_sampler(
    model,
    params,
    a_shape: Tuple[int, int, int],  # (B, 96, padded)
    steps: int,
    sampler: str = "ddim",
    cond_scale: float = 2.0,
    aot_dir: Optional[Path] = None,
) -> Path:
    """Trace + lower the sampler once and serialize the StableHLO to disk.

    Returns the artifact path. This is the expensive call (pays the full
    host-side trace); run it at train end or on first serve."""
    aot_dir = Path(aot_dir or DEFAULT_AOT_DIR)
    aot_dir.mkdir(parents=True, exist_ok=True)
    B, _, padded = a_shape
    path = aot_dir / (_sampler_key(model, B, padded, steps, sampler, cond_scale) + ".jaxexport")

    fn = _sample_fn(model, steps, sampler, cond_scale)
    specs = (
        jax.tree.map(lambda p: jax.ShapeDtypeStruct(p.shape, p.dtype), params),
        jax.ShapeDtypeStruct((B, 96, padded), jnp.float32),
        jax.ShapeDtypeStruct((B, 5), jnp.float32),
        jax.ShapeDtypeStruct((B, model.model_cfg.dim_in_x, padded), jnp.float32),
    )
    exported = jax_export.export(jax.jit(fn))(*specs)
    blob = exported.serialize()
    tmp = path.with_suffix(".tmp")
    tmp.write_bytes(blob)
    tmp.replace(path)  # atomic publish (SURVEY.md section 5.2 discipline)
    return path


def _save_executable(compiled, path: Path) -> bool:
    """Persist a jax.stages.Compiled as a chip-specific binary blob.

    Returns False (and writes nothing) on backends whose executables don't
    support serialization — callers then stay on the StableHLO path."""
    import pickle

    from jax.experimental import serialize_executable as se

    try:
        blob, in_tree, out_tree = se.serialize(compiled)
    except (ValueError, NotImplementedError):
        return False
    tmp = path.with_suffix(".tmp")
    tmp.write_bytes(pickle.dumps((blob, in_tree, out_tree)))
    tmp.replace(path)  # atomic publish
    return True


def _load_executable(path: Path):
    """Deserialize a persisted executable; None if incompatible/corrupt."""
    import pickle

    from jax.experimental import serialize_executable as se

    try:
        blob, in_tree, out_tree = pickle.loads(path.read_bytes())
        return se.deserialize_and_load(blob, in_tree, out_tree)
    except Exception:
        return None  # stale blob (runtime/chip change): fall back to StableHLO


def _compile_exported(exported):
    """AOT-compile a deserialized Exported: its own in_tree/in_avals give the
    argument specs, so no caller-side params are needed."""
    args, kwargs = jax.tree.unflatten(
        exported.in_tree, [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in exported.in_avals]
    )
    return jax.jit(exported.call).lower(*args, **kwargs).compile()


def load_sampler(
    model,
    a_shape: Tuple[int, int, int],
    steps: int,
    sampler: str = "ddim",
    cond_scale: float = 2.0,
    aot_dir: Optional[Path] = None,
) -> Optional[Callable]:
    """Load a previously exported sampler, or None if absent.

    Fast path: the persisted EXECUTABLE (.xexec) deserializes in seconds —
    no tracing, no XLA compile. Fallback: the StableHLO (.jaxexport) is
    AOT-compiled here and the resulting executable is persisted for the next
    process. The returned callable takes (params, a, c, x)."""
    aot_dir = Path(aot_dir or DEFAULT_AOT_DIR)
    B, _, padded = a_shape
    key = _sampler_key(model, B, padded, steps, sampler, cond_scale)
    xpath = aot_dir / (key + ".xexec")
    compiled = _load_executable(xpath) if xpath.exists() else None
    if compiled is None:
        path = aot_dir / (key + ".jaxexport")
        if not path.exists():
            return None
        exported = jax_export.deserialize(path.read_bytes())
        compiled = _compile_exported(exported)
        _save_executable(compiled, xpath)

    def run(params, a, c, x):
        return compiled(
            params, jnp.asarray(a, jnp.float32), jnp.asarray(c, jnp.float32), jnp.asarray(x, jnp.float32)
        )

    return run


def load_or_export_sampler(
    model,
    params,
    a_shape: Tuple[int, int, int],
    steps: int,
    sampler: str = "ddim",
    cond_scale: float = 2.0,
    aot_dir: Optional[Path] = None,
) -> Callable:
    """Fast path when the artifact exists; exports (and then loads) otherwise."""
    run = load_sampler(model, a_shape, steps, sampler, cond_scale, aot_dir)
    if run is None:
        export_sampler(model, params, a_shape, steps, sampler, cond_scale, aot_dir)
        run = load_sampler(model, a_shape, steps, sampler, cond_scale, aot_dir)
        assert run is not None
    return run

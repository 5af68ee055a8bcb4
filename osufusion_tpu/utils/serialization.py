"""Param pytree <-> safetensors interop (reference exports model.safetensors,
trainer.py:143-145, and loads either .pt or safetensors at inference,
inference_gradio.py:32-42)."""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict

import jax
import numpy as np


def flatten_params(params: Any) -> Dict[str, np.ndarray]:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return {
        "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp): np.asarray(v)
        for kp, v in flat
    }


def unflatten_params(tensors: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, value in tensors.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def save_safetensors(params: Any, path: Path) -> None:
    from safetensors.numpy import save_file

    save_file(flatten_params(params), str(path))


def load_safetensors(path: Path) -> Dict[str, Any]:
    from safetensors.numpy import load_file

    return unflatten_params(load_file(str(path)))


def load_params_lenient(params_like: Any, loaded_flat_or_tree: Any, verbose: bool = True) -> Any:
    """Fill ``params_like`` with matching entries from a loaded tree,
    reporting missing/unexpected keys instead of failing — the analog of the
    reference's ``strict=False`` fallback when the architecture changed
    (reference trainer.py:193-199)."""
    import jax
    import jax.numpy as jnp

    loaded = loaded_flat_or_tree if isinstance(loaded_flat_or_tree, dict) else {}
    flat_loaded = flatten_params(loaded)
    flat_like = jax.tree_util.tree_flatten_with_path(params_like)[0]

    def path_str(kp) -> str:
        return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)

    like_shapes = {path_str(kp): v.shape for kp, v in flat_like}
    like_keys = set(like_shapes)
    missing = sorted(like_keys - set(flat_loaded))
    unexpected = sorted(set(flat_loaded) - like_keys)
    mismatched = sorted(
        k for k in like_keys & set(flat_loaded) if flat_loaded[k].shape != like_shapes[k]
    )
    if verbose and missing:
        print(f"Missing keys ({len(missing)}): {missing[:8]}{'...' if len(missing) > 8 else ''}")
    if verbose and unexpected:
        print(f"Unexpected keys ({len(unexpected)}): {unexpected[:8]}{'...' if len(unexpected) > 8 else ''}")
    if verbose and mismatched:
        # a key that exists but with the wrong shape means the architectures
        # disagree — the most dangerous case, since the random init stays
        examples = [f"{k} {flat_loaded[k].shape}->{like_shapes[k]}" for k in mismatched[:4]]
        print(
            f"Shape-mismatched keys kept at their INIT values ({len(mismatched)}): "
            f"{examples}{'...' if len(mismatched) > 4 else ''}"
        )

    def fill(kp, ref):
        key = path_str(kp)
        if key in flat_loaded and flat_loaded[key].shape == ref.shape:
            return jnp.asarray(flat_loaded[key], ref.dtype)
        return ref

    return jax.tree_util.tree_map_with_path(fill, params_like)

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

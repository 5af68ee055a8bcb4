"""LoRA / DoRA fine-tuning as parameter-overlay pytrees.

Capability parity with the reference's PEFT integration (reference
trainer_peft.py:236-244 LoraConfig r=32 alpha=32 use_dora, targeting attention
projections and the residual blocks' conv kernels; osu_fusion/modules/
lora_layers.py for the custom Conv1d adapter and DoRA norm math) — built the
functional JAX way instead of module surgery:

- an adapter is a pytree mirroring the matched subset of the base params,
  holding ``{"a": A, "b": B[, "m": magnitude]}`` per matched kernel;
- the forward path applies adapters in WEIGHT space:
      lora:  W_eff = W + scale * (A o B)
      dora:  W_eff = m * (W + scale * (A o B)) / stop_grad(||W + scale*(A o B)||)
  which is algebraically identical to the reference's activation-space
  formulation (lora_layers.py:59-92: the norm is detached there too) but costs
  zero extra matmuls in the model forward — ideal under jit, where the merge
  is a tiny per-step param transform fused by XLA;
- gradients flow to (A, B, m) only: train with ``jax.grad`` over the adapter
  tree while the base params stay frozen;
- ``merge_lora`` bakes adapters into the base for export
  (= reference merge_and_unload -> merged_model.safetensors).

Conv kernels (k, in, out) get A (k, in, r) + B (r, out) — the same
factorization as the reference's Conv1d(in, r, kernel) -> Conv1d(r, out, 1)
pair, composed as a single matmul over the rank dim.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

# Our param paths for the reference's target_modules
# ["attn.to_q", "attn.to_kv", "attn.linear", "block1.proj", "block2.proj"]
DEFAULT_TARGETS = (
    r"attn/to_q/kernel$",
    r"attn/to_kv/kernel$",
    r"attn/to_out/kernel$",
    r"FiLMBlock_0/Conv_0/kernel$",
    r"FiLMBlock_1/Conv_0/kernel$",
)


@dataclass(frozen=True)
class LoraConfig:
    r: int = 32
    alpha: float = 32.0
    use_dora: bool = True
    use_rslora: bool = False
    target_patterns: Tuple[str, ...] = DEFAULT_TARGETS

    @property
    def scaling(self) -> float:
        return self.alpha / (self.r**0.5) if self.use_rslora else self.alpha / self.r


def _path_str(kp) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)


def _matches(path: str, cfg: LoraConfig) -> bool:
    return any(re.search(p, path) for p in cfg.target_patterns)


def _delta(a: jnp.ndarray, b: jnp.ndarray, scaling: float) -> jnp.ndarray:
    """Compose the low-rank factors into a full-kernel delta.

    Dense: A (in, r) @ B (r, out). Conv: A (k, in, r) x B (r, out) contracted
    over r (equivalent to conv-composing Conv(in,r,k) with Conv(r,out,1)).
    """
    return jnp.einsum("...ir,ro->...io", a, b) * scaling


def _weight_norm(w: jnp.ndarray) -> jnp.ndarray:
    """L2 norm per output column, over all other axes (reference
    lora_layers.py:22-26 norms dims (1,2) of (out,in,k); ours is (..., out))."""
    axes = tuple(range(w.ndim - 1))
    return jnp.sqrt(jnp.sum(w.astype(jnp.float32) ** 2, axis=axes) + 1e-12)


def init_lora(params: Any, cfg: LoraConfig, rng: jax.Array) -> Dict[str, Dict[str, jnp.ndarray]]:
    """Create the adapter tree: {path: {"a", "b"[, "m"]}} for matched kernels.

    A: He-uniform init; B: zeros (so the adapter starts as identity); DoRA
    magnitude m initialized to ||W|| (exact, since delta starts at zero).
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    adapters: Dict[str, Dict[str, jnp.ndarray]] = {}
    for kp, w in flat:
        path = _path_str(kp)
        if not _matches(path, cfg) or w.ndim < 2:
            continue
        rng, key = jax.random.split(rng)
        in_shape = (*w.shape[:-1], cfg.r)  # (in, r) or (k, in, r)
        fan_in = int(jnp.prod(jnp.asarray(w.shape[:-1])))
        bound = (6.0 / fan_in) ** 0.5
        entry = {
            "a": jax.random.uniform(key, in_shape, w.dtype, -bound, bound),
            "b": jnp.zeros((cfg.r, w.shape[-1]), w.dtype),
        }
        if cfg.use_dora:
            entry["m"] = _weight_norm(w).astype(w.dtype)
        adapters[path] = entry
    if not adapters:
        raise ValueError("no parameters matched the LoRA target patterns")
    return adapters


def apply_lora(params: Any, adapters: Dict[str, Dict[str, jnp.ndarray]], cfg: LoraConfig) -> Any:
    """Effective params for the forward pass. Differentiable wrt adapters;
    DoRA norm is stop-gradiented exactly like the reference (:76-79)."""

    def transform(kp, w):
        path = _path_str(kp)
        entry = adapters.get(path)
        if entry is None:
            return w
        merged = w + _delta(entry["a"], entry["b"], cfg.scaling).astype(w.dtype)
        if cfg.use_dora:
            norm = jax.lax.stop_gradient(_weight_norm(merged)).astype(w.dtype)
            merged = merged * (entry["m"] / norm)
        return merged

    return jax.tree_util.tree_map_with_path(transform, params)


def merge_lora(params: Any, adapters: Dict[str, Dict[str, jnp.ndarray]], cfg: LoraConfig) -> Any:
    """Bake adapters into base params permanently (safe-merge NaN check
    included, reference lora_layers.py:204-223)."""
    merged = apply_lora(params, adapters, cfg)
    for leaf in jax.tree.leaves(merged):
        if not bool(jnp.isfinite(leaf).all()):
            raise ValueError("NaNs detected in the merged weights. The adapter seems to be broken")
    return merged


def count_lora_params(adapters: Dict[str, Dict[str, jnp.ndarray]]) -> Tuple[int, int]:
    """(trainable, total-per-layer-entries) — for print_trainable_parameters parity."""
    trainable = sum(int(v.size) for entry in adapters.values() for v in entry.values())
    return trainable, len(adapters)

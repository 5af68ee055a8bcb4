"""Fused-attention dispatch: grouped-query SDPA.

The reference wraps torch ``scaled_dot_product_attention`` with CUDA
flash-kernel selection and repeats KV heads to full MHA before the kernel
(osu_fusion/modules/attention.py:61-101, unet.py:129-135). On TPU we instead:

- keep KV heads UN-repeated and let the grouped einsum broadcast them —
  XLA never materializes the repeated KV tensor, which matters at MQA
  (kv_heads=1) where the reference's repeat costs heads x memory;
- compute logits/softmax in float32 and the two matmuls in the activation
  dtype (bf16 in training) with fp32 accumulation on the MXU;
- optionally dispatch to a Pallas flash kernel (ops/pallas_attention.py)
  for long sequences, falling back to this XLA path everywhere else.
"""

from __future__ import annotations

import contextlib
import contextvars
import functools

import jax
import jax.numpy as jnp

_FORCE_XLA = contextvars.ContextVar("osufusion_force_xla_attention", default=False)


@contextlib.contextmanager
def force_xla_attention():
    """Trace-time escape hatch: use the XLA einsum path regardless of backend
    (e.g. when tracing for the host CPU, where the TPU kernel can't lower)."""
    token = _FORCE_XLA.set(True)
    try:
        yield
    finally:
        _FORCE_XLA.reset(token)


@functools.lru_cache(maxsize=1)
def on_tpu() -> bool:
    try:
        return any("tpu" in d.device_kind.lower() for d in jax.devices())
    except Exception:
        return False


def sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    backend: str = "auto",
    window: int | None = None,
    rope: tuple | None = None,
) -> jnp.ndarray:
    """Dispatch: Pallas flash kernel on TPU for tileable shapes, XLA einsum
    otherwise. q (B, T, H, D); k/v (B, S, Kv, D). ``window`` (tokens) enables
    sliding-window local attention: each query sees keys within +/- window/2.
    ``rope`` = (cos, sin) tables (T, D) — when given, q/k arrive UNROTATED
    and the rotary embedding is applied here (fused into the kernel on the
    forward-only inference path)."""
    from osufusion_tpu.ops.pallas_attention import flash_attention, flash_attention_available
    from osufusion_tpu.ops.rope import apply_rope
    from osufusion_tpu.parallel.ring import ring_attention, ring_available
    from osufusion_tpu.parallel.sequence import seq_axis_size, seq_parallel_available, sequence_parallel_attention

    B, T, H, D = q.shape
    S, Kv = k.shape[1], k.shape[2]
    # sequence parallelism: when the ambient mesh (set_mesh around the jitted
    # train step) has a seq axis, keep the frame axis sharded through the
    # attention site instead of letting GSPMD all-gather it for a
    # single-device kernel call: the halo-exchange kernels when this site's
    # window is engaged (O(window) ICI), the ring rotation when attention is
    # global (O(T) ICI — every DiT layer and the UNet levels at or below the
    # trained context). No on_tpu() gate: a seq axis only exists when the
    # trainer built a seq mesh, and the shard_map body is per-device manual
    # code (runs interpreted in the CPU mesh tests, compiled on real chips).
    n_seq = 0 if _FORCE_XLA.get() or backend not in ("pallas", "auto") else seq_axis_size()
    if n_seq > 1 and seq_parallel_available(T, S, D, window, n_seq):
        if rope is not None:
            q = apply_rope(q, *rope)
            k = apply_rope(k, *rope)
        return sequence_parallel_attention(q, k, v, window, batch_axis="data")
    if n_seq > 1 and ring_available(T, S, D, window, n_seq, H, Kv):
        if rope is not None:
            q = apply_rope(q, *rope)
            k = apply_rope(k, *rope)
        return ring_attention(q, k, v, batch_axis="data")
    use_flash = not _FORCE_XLA.get() and (
        backend == "pallas"
        or (backend == "auto" and on_tpu() and flash_attention_available(T, S, D, H, Kv))
    )
    if use_flash:
        return flash_attention(q, k, v, window=window, rope=rope)
    if rope is not None:
        q = apply_rope(q, *rope)
        k = apply_rope(k, *rope)
    return gqa_attention(q, k, v, window=window)


def gqa_attention(
    q: jnp.ndarray,  # (B, T, H, D)
    k: jnp.ndarray,  # (B, S, Kv, D)
    v: jnp.ndarray,  # (B, S, Kv, D)
    window: int | None = None,
) -> jnp.ndarray:
    """Grouped-query scaled-dot-product attention. Returns (B, T, H, D)."""
    B, T, H, D = q.shape
    S = k.shape[1]
    Kv = k.shape[2]
    assert H % Kv == 0, f"heads {H} not divisible by kv_heads {Kv}"
    G = H // Kv

    scale = D**-0.5
    qg = q.reshape(B, T, Kv, G, D)

    # logits in fp32 for a stable softmax
    logits = jnp.einsum("btkgd,bskd->bkgts", qg, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if window is not None and S > window:
        rows = jnp.arange(T)[:, None]
        cols = jnp.arange(S)[None, :]
        mask = jnp.abs(rows - cols) <= window // 2
        logits = jnp.where(mask[None, None, None], logits, -1e30)
    probs = jnp.exp(logits - logits.max(axis=-1, keepdims=True))
    probs = probs / probs.sum(axis=-1, keepdims=True)

    out = jnp.einsum("bkgts,bskd->btkgd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32)
    return out.reshape(B, T, H, D).astype(q.dtype)

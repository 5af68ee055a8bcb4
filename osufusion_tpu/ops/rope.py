"""Rotary position embedding with length interpolation.

Same math as the reference (osu_fusion/modules/attention.py:15-58): positions
are rescaled by ``scale_base / seq_len`` so any sequence length maps onto the
trained context span, and tables are always computed in float32 regardless of
the activation dtype (the reference forces fp32 via an autocast decorator).

Here the tables are pure functions of (seq_len, dim) evaluated at trace time —
under jit they are constant-folded into the compiled program, so there is no
runtime cache to manage.
"""

from __future__ import annotations

import jax.numpy as jnp


def rope_tables(seq_len: int, dim: int, scale_base: float, theta: float = 10000.0):
    """cos/sin tables, each (seq_len, dim), float32, length-interpolated."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    t = jnp.arange(seq_len, dtype=jnp.float32) * (scale_base / seq_len)
    freqs = jnp.einsum("i,j->ij", t, inv_freq)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x: (..., seq, heads, dim) or (..., seq, dim); fp32 rotation for fp32 x.

    For low-precision activations the fp32 TABLES are cast to the activation
    dtype and the rotation runs in that dtype: the reference's fp32-rope
    output is immediately quantized back to bf16 by its SDPA autocast
    (osu_fusion/modules/attention.py:87-93), so quantizing the tables before
    the multiply instead of after differs by at most one ulp — while halving
    the bytes of what profiles as the single most expensive elementwise pass
    in the denoiser (the rotate-half slice/negate/concat over (B,H,T,D))."""
    if x.ndim == 4:  # (B, T, H, D): broadcast tables over heads
        cos = cos[None, :, None, :]
        sin = sin[None, :, None, :]
    cos = cos.astype(x.dtype)
    sin = sin.astype(x.dtype)
    return x * cos + rotate_half(x) * sin

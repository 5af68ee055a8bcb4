"""fp8 quantized matmuls — the TPU-native analog of MS-AMP O1.

The reference exposes ``--mixed-precision fp8`` through Accelerate + MS-AMP
(reference trainer.py:210,:374): O1 keeps the optimizer master state in high
precision and runs the GEMMs on fp8 operands with per-tensor dynamic scales.
The TPU equivalent here:

- the big Dense projections (attention q/kv/out, FF) run their forward dot
  on ``float8_e4m3fn`` operands with per-tensor dynamic scaling
  (scale = amax / 448), accumulating in f32 and rescaling on the way out;
- the backward is straight-through in the activation dtype (bf16): exact
  gradients of the unquantized linear layer, matching MS-AMP's
  higher-precision wgrad/dgrad at O1;
- the optimizer state stays whatever the trainer configured (fp32 by
  default, bf16 under --full-bf16) — master-weight semantics unchanged.

On hardware without native fp8 MXU paths (TPU v5e) XLA emulates the f8 dot,
so this mode is about MEMORY/numerics parity with the reference's surface,
not speed; on fp8-capable backends the same program uses the fast path.

Quantization is a process-level mode set from the model config at build time
(``set_quantization``) rather than threaded through every module — the flag
is read at TRACE time inside jit, so it must be set before the first
forward is traced (``build_model`` does this).
"""

from __future__ import annotations

import contextvars
import functools

import jax
import jax.numpy as jnp
from jax import lax

E4M3_MAX = 448.0

_QUANT_MODE = contextvars.ContextVar("osufusion_quant_mode", default="none")


def set_quantization(mode: str) -> None:
    """"none" | "fp8". Read at trace time by ``quantized_dot_general``."""
    assert mode in ("none", "fp8"), mode
    _QUANT_MODE.set(mode)


def quantization_mode() -> str:
    return _QUANT_MODE.get()


def _quantize_e4m3(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    scale = jnp.maximum(amax, 1e-12) / E4M3_MAX
    q = (x.astype(jnp.float32) / scale).astype(jnp.float8_e4m3fn)
    return q, scale


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _fp8_dense_dot(x, w, out_dtype):
    """x (..., K) @ w (K, N) on e4m3 operands with dynamic per-tensor scales."""
    qx, sx = _quantize_e4m3(x)
    qw, sw = _quantize_e4m3(w)
    y = lax.dot_general(
        qx, qw, (((x.ndim - 1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    return (y * (sx * sw)).astype(out_dtype)


def _fp8_fwd(x, w, out_dtype):
    return _fp8_dense_dot(x, w, out_dtype), (x, w)


def _fp8_bwd(out_dtype, res, g):
    # straight-through: exact gradients of the UNQUANTIZED layer, computed in
    # the activation dtype (MS-AMP O1 keeps wgrad/dgrad in high precision)
    x, w = res
    g = g.astype(x.dtype)
    dx = lax.dot_general(g, w, (((g.ndim - 1,), (1,)), ((), ())))
    x2 = x.reshape(-1, x.shape[-1])
    g2 = g.reshape(-1, g.shape[-1])
    dw = lax.dot_general(x2, g2, (((0,), (0,)), ((), ()))).astype(w.dtype)
    return dx.astype(x.dtype), dw


_fp8_dense_dot.defvjp(_fp8_fwd, _fp8_bwd)


def quantized_dot_general(lhs, rhs, dimension_numbers, precision=None, preferred_element_type=None):
    """Drop-in ``dot_general`` for ``flax.linen.Dense``: fp8 when the process
    quantization mode is "fp8" and the dot is the plain dense contraction
    ((ndim-1,), (0,)) with no batch dims; the exact XLA dot otherwise."""
    (lc, rc), (lb, rb) = dimension_numbers
    dense_shape = tuple(lc) == (lhs.ndim - 1,) and tuple(rc) == (0,) and not lb and not rb
    if _QUANT_MODE.get() != "fp8" or not dense_shape or rhs.ndim != 2:
        return lax.dot_general(
            lhs, rhs, dimension_numbers, precision=precision,
            preferred_element_type=preferred_element_type,
        )
    return _fp8_dense_dot(lhs, rhs, lhs.dtype)

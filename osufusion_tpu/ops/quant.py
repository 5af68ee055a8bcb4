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

The mode is threaded from ``ModelConfig.quant`` through the module tree as a
construction parameter (each module binds it into its dot_general via
``quant_dot``), so two models with different quant settings coexist in one
process and a retrace on a fresh thread cannot silently flip the numerics.
``set_quantization`` remains as a process-wide DEFAULT for call sites that
don't thread the mode (it is a plain module global, not a ContextVar, so new
threads see the same value).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

E4M3_MAX = 448.0

_QUANT_MODE = ["none"]  # plain global: shared across threads, default only


def set_quantization(mode: str) -> None:
    """Process-wide default mode: "none" | "fp8". Modules that thread
    ``ModelConfig.quant`` explicitly (the whole UNet stack) ignore this."""
    assert mode in ("none", "fp8"), mode
    _QUANT_MODE[0] = mode


def quantization_mode() -> str:
    return _QUANT_MODE[0]


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


def quantized_dot_general(
    lhs, rhs, dimension_numbers, precision=None, preferred_element_type=None, mode=None
):
    """Drop-in ``dot_general`` for ``flax.linen.Dense``: fp8 when the mode
    (explicit, else the process default) is "fp8" and the dot is the plain
    dense contraction ((ndim-1,), (0,)) with no batch dims; the exact XLA dot
    otherwise."""
    (lc, rc), (lb, rb) = dimension_numbers
    dense_shape = tuple(lc) == (lhs.ndim - 1,) and tuple(rc) == (0,) and not lb and not rb
    mode = mode if mode is not None else _QUANT_MODE[0]
    if mode != "fp8" or not dense_shape or rhs.ndim != 2:
        return lax.dot_general(
            lhs, rhs, dimension_numbers, precision=precision,
            preferred_element_type=preferred_element_type,
        )
    return _fp8_dense_dot(lhs, rhs, lhs.dtype)


def quant_dot(mode: str):
    """The ``dot_general`` callable for a module built with quant ``mode`` —
    bound at module-construction time so the numerics are a property of the
    MODEL, not of process-global state at trace time."""
    if mode == "none":
        return lax.dot_general
    return functools.partial(quantized_dot_general, mode=mode)


# ------------------------------------------------------------- fp8 conv path


def _conv_taps(xp: jnp.ndarray, kernel: jnp.ndarray, t_out: int, stride: int) -> jnp.ndarray:
    """The unquantized shifted-matmul conv on a PRE-PADDED (B, Tp, Cin) input
    (mirror of nn.conv.conv1d_matmul's inner loop); used for the exact
    straight-through backward."""
    k = kernel.shape[0]
    y = None
    for j in range(k):
        tap = xp[:, j : j + (t_out - 1) * stride + 1 : stride]
        d = jnp.einsum("btc,cd->btd", tap, kernel[j], preferred_element_type=jnp.float32)
        y = d if y is None else y + d
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fp8_conv1d_dot(xp, kernel, t_out, stride, out_dtype):
    """k-tap 1-D conv as k shifted matmuls on e4m3 operands (MS-AMP O1
    quantizes conv GEMMs too). The input is quantized ONCE — tap slices of
    the quantized tensor share its scale — and the whole (k, Cin, Cout)
    kernel shares one scale, so the rescale happens once on the way out."""
    qx, sx = _quantize_e4m3(xp)
    qw, sw = _quantize_e4m3(kernel)
    k = kernel.shape[0]
    y = None
    for j in range(k):
        tap = qx[:, j : j + (t_out - 1) * stride + 1 : stride]
        d = lax.dot_general(tap, qw[j], (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        y = d if y is None else y + d
    return (y * (sx * sw)).astype(out_dtype)


def _fp8_conv_fwd(xp, kernel, t_out, stride, out_dtype):
    return fp8_conv1d_dot(xp, kernel, t_out, stride, out_dtype), (xp, kernel)


def _fp8_conv_bwd(t_out, stride, out_dtype, res, g):
    # straight-through: exact gradients of the unquantized conv in the
    # activation dtype (MS-AMP O1 keeps wgrad/dgrad in high precision)
    xp, kernel = res
    _, vjp = jax.vjp(lambda x, w: _conv_taps(x, w, t_out, stride), xp, kernel)
    dx, dw = vjp(g.astype(jnp.float32))
    return dx.astype(xp.dtype), dw.astype(kernel.dtype)


fp8_conv1d_dot.defvjp(_fp8_conv_fwd, _fp8_conv_bwd)

"""1-D convolution as shifted matmuls — the MXU-native formulation.

XLA lowers ``lax.conv`` on TPU through a generic spatial pipeline that, for
the channel-last (B, T, C) convolutions this model is made of, reaches only
~20 TF/s on a v5e. The same k-tap convolution expressed as k shifted
(B*T, Cin) @ (Cin, Cout) matmuls runs ~3x faster: each dot is a plain MXU
contraction over Cin, and XLA fuses the shifts (static slices of the padded
input) into the operand reads. The backward inherits the win — dW becomes k
(Cin, B*T) @ (B*T, Cout) full-contraction matmuls and dx a mirrored
shifted-dot pass, instead of XLA's conv-transpose lowering.

``MatmulConv`` is a drop-in replacement for ``flax.linen.Conv`` on rank-3
inputs: same parameter names ("kernel" (k, Cin, Cout), "bias" (Cout,)), same
initializers, same SAME/VALID/int padding semantics — checkpoints and
PyTorch-transplant mappings are unaffected. Tiny contractions (stems with
Cin < 64, e.g. the 6-channel signal input) stay on ``lax.conv``: a
64-contraction MXU pass beats nothing out of a 6-deep one.
"""

from __future__ import annotations

from typing import Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

# below this contraction depth the MXU formulation has no edge: keep XLA conv
MIN_MATMUL_CIN = 64


def conv1d_matmul(
    x: jnp.ndarray,  # (B, T, Cin)
    kernel: jnp.ndarray,  # (k, Cin, Cout)
    pad_lo: int,
    pad_hi: int,
    stride: int = 1,
) -> jnp.ndarray:
    """k-tap 1-D convolution as k shifted matmuls, f32 accumulation."""
    k = kernel.shape[0]
    xp = jnp.pad(x, ((0, 0), (pad_lo, pad_hi), (0, 0))) if (pad_lo or pad_hi) else x
    t_out = (xp.shape[1] - k) // stride + 1
    y = None
    for j in range(k):
        tap = xp[:, j : j + (t_out - 1) * stride + 1 : stride]
        d = jnp.einsum("btc,cd->btd", tap, kernel[j], preferred_element_type=jnp.float32)
        y = d if y is None else y + d
    return y


class MatmulConv(nn.Module):
    """``nn.Conv``-compatible channel-last 1-D conv on the MXU (see module
    docstring). Only the features this codebase uses are implemented:
    rank-3 input, odd kernel, int/SAME/VALID padding, optional stride."""

    features: int
    kernel_size: Sequence[int] = (3,)
    strides: Sequence[int] = (1,)
    padding: Union[str, int] = "SAME"
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()
    bias_init: nn.initializers.Initializer = nn.initializers.zeros
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    # "fp8": the k shifted matmuls run on dynamically-scaled e4m3 operands
    # (ops/quant.py fp8_conv1d_dot) — MS-AMP O1 quantizes conv GEMMs too, and
    # after the conv-as-matmul rewrite these dots carry the bulk of the
    # model's non-attention FLOPs
    quant: str = "none"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        (k,) = self.kernel_size
        (stride,) = self.strides
        cin = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init, (k, cin, self.features), self.param_dtype)
        bias = (
            self.param("bias", self.bias_init, (self.features,), self.param_dtype)
            if self.use_bias
            else None
        )

        if self.padding == "SAME":
            assert stride == 1, "SAME padding implemented for stride 1 only"
            pad_lo, pad_hi = (k - 1) // 2, k // 2
        elif self.padding == "VALID":
            pad_lo = pad_hi = 0
        else:
            pad_lo = pad_hi = int(self.padding)

        x = x.astype(self.dtype)
        kern = kernel.astype(self.dtype)
        if cin >= MIN_MATMUL_CIN:
            if self.quant == "fp8":
                from osufusion_tpu.ops.quant import fp8_conv1d_dot

                xp = jnp.pad(x, ((0, 0), (pad_lo, pad_hi), (0, 0))) if (pad_lo or pad_hi) else x
                t_out = (xp.shape[1] - k) // stride + 1
                y = fp8_conv1d_dot(xp, kern, t_out, stride, self.dtype)
            else:
                y = conv1d_matmul(x, kern, pad_lo, pad_hi, stride)
        else:
            y = jax.lax.conv_general_dilated(
                x,
                kern,
                (stride,),
                [(pad_lo, pad_hi)],
                dimension_numbers=("NWC", "WIO", "NWC"),
            )
        y = y.astype(self.dtype)
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y

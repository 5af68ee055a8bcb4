"""Shared denoiser building blocks (flax linen, channel-last (B, T, C)).

Capability parity with reference osu_fusion/modules/{unet,residual}.py building
blocks — CrossEmbedLayer (unet.py:42), Upsample/Downsample (:61/:77),
Attention with GQA + length-rescaled RoPE (:104), TransformerBlock (:159),
FiLM Block / ResidualBlock with GlobalContext or SqueezeExcite gating
(residual.py:14-137) — designed channel-last so every conv/linear lands on the
MXU without layout transposes (the reference transposes b d n <-> b n d around
every attention block).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from osufusion_tpu.nn.conv import MatmulConv
from osufusion_tpu.ops.attention import sdpa
from osufusion_tpu.ops.quant import quant_dot
from osufusion_tpu.ops.rope import rope_tables
from osufusion_tpu.utils.profiling import named_scope

Dtype = jnp.dtype


def sinusoidal_embedding(t: jnp.ndarray, dim: int, theta: float = 10000.0) -> jnp.ndarray:
    """(B,) timesteps -> (B, dim) sinusoidal embedding (fp32)."""
    half_dim = dim // 2
    emb = math.log(theta) / (half_dim - 1)
    emb = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
    emb = t.astype(jnp.float32)[:, None] * emb[None, :]
    return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)


class TimeEmbedding(nn.Module):
    """Sinusoidal embedding -> 2-layer MLP (reference unet.py:356-361)."""

    dim_emb: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        x = sinusoidal_embedding(t, self.dim_emb).astype(self.dtype)
        x = nn.Dense(self.dim_emb, dtype=self.dtype, param_dtype=self.param_dtype)(x)
        x = nn.silu(x)
        return nn.Dense(self.dim_emb, dtype=self.dtype, param_dtype=self.param_dtype)(x)


class CondEmbedding(nn.Module):
    """Conditioning-vector MLP (reference unet.py:362-366)."""

    dim_emb: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, c: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.dim_emb, dtype=self.dtype, param_dtype=self.param_dtype)(c)
        x = nn.silu(x)
        return nn.Dense(self.dim_emb, dtype=self.dtype, param_dtype=self.param_dtype)(x)


class CrossEmbedLayer(nn.Module):
    """Multi-kernel parallel conv stem with halving channel split
    (reference unet.py:42-58). NOTE the reference splits the per-kernel
    channel widths by the INPUT dim (``dim_scales = dim_in / 2**i``), not the
    output dim as upstream imagen does — e.g. the 6-channel signal stem gives
    (3, 1, dim_h-4) and the 96-bin audio stem gives (48, 24, dim_h-72).
    Replicated exactly for weight-level parity (it also means dim_h must
    exceed 72 for the audio stem, matching the reference's constraint)."""

    dim_out: int
    kernel_sizes: Sequence[int] = (3, 7, 15)
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    quant: str = "none"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel_sizes = sorted(self.kernel_sizes)
        num_scales = len(kernel_sizes)
        dim_in = x.shape[-1]
        dim_scales = [dim_in // (2**i) for i in range(1, num_scales)]
        dim_scales = [*dim_scales, self.dim_out - sum(dim_scales)]
        if dim_scales[-1] <= 0:
            # the reference cannot build this case at all (negative channels);
            # fall back to upstream imagen's output-dim split so small test
            # models remain constructible. Production configs (dim_h > 72)
            # are unaffected and stay reference-exact.
            dim_scales = [self.dim_out // (2**i) for i in range(1, num_scales)]
            dim_scales = [*dim_scales, self.dim_out - sum(dim_scales)]

        outs = []
        for idx, (kernel, dim_scale) in enumerate(zip(kernel_sizes, dim_scales)):
            outs.append(
                MatmulConv(
                    dim_scale,
                    kernel_size=(kernel,),
                    padding=kernel // 2,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    quant=self.quant,
                    name=f"Conv_{idx}",  # keep flax auto-names of the nn.Conv era
                )(x)
            )
        return jnp.concatenate(outs, axis=-1)


class Downsample(nn.Module):
    """Stride-2 conv with asymmetric right reflect pad (reference unet.py:77-92)."""

    dim_out: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    quant: str = "none"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 0)), mode="reflect")
        return MatmulConv(
            self.dim_out,
            kernel_size=(3,),
            strides=(2,),
            padding="VALID",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            quant=self.quant,
            name="Conv_0",
        )(x)


class Upsample(nn.Module):
    """Nearest x2 then conv3 (reference unet.py:61-74)."""

    dim_out: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    quant: str = "none"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, c = x.shape
        x = jnp.repeat(x, 2, axis=1)
        return MatmulConv(
            self.dim_out, kernel_size=(3,), padding=1, dtype=self.dtype, param_dtype=self.param_dtype,
            quant=self.quant, name="Conv_0"
        )(x)


class ParallelConvOut(nn.Module):
    """Sum of conv3 and conv1 (last-level sampler, reference unet.py:223-226)."""

    dim_out: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    quant: str = "none"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        a = MatmulConv(self.dim_out, kernel_size=(3,), padding=1, dtype=self.dtype, param_dtype=self.param_dtype, quant=self.quant, name="Conv_0")(x)
        b = MatmulConv(self.dim_out, kernel_size=(1,), dtype=self.dtype, param_dtype=self.param_dtype, quant=self.quant, name="Conv_1")(x)
        return a + b


class GlobalContext(nn.Module):
    """Attention-style squeeze-excite gate (reference residual.py:14-37):
    softmax-pooled global context -> bottleneck MLP -> sigmoid gate."""

    dim_out: int
    reduction: int = 2
    dim_min: int = 8
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (B, T, C)
        k = nn.Dense(1, dtype=self.dtype, param_dtype=self.param_dtype)(x)  # (B, T, 1)
        w = nn.softmax(k.astype(jnp.float32), axis=1).astype(x.dtype)
        pooled = jnp.einsum("btc,btk->bkc", x, w)  # (B, 1, C)
        inner = max(self.dim_min, self.dim_out // self.reduction)
        h = nn.Dense(inner, dtype=self.dtype, param_dtype=self.param_dtype)(pooled)
        h = nn.silu(h)
        h = nn.Dense(self.dim_out, dtype=self.dtype, param_dtype=self.param_dtype)(h)
        return nn.sigmoid(h)  # (B, 1, dim_out), broadcasts over T


class SqueezeExcite(nn.Module):
    """Average-pool squeeze-excite gate (reference residual.py:40-59)."""

    dim_out: int
    reduction: int = 2
    dim_min: int = 8
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pooled = x.mean(axis=1, keepdims=True)  # (B, 1, C)
        inner = max(self.dim_min, self.dim_out // self.reduction)
        h = nn.Dense(inner, dtype=self.dtype, param_dtype=self.param_dtype)(pooled)
        h = nn.silu(h)
        h = nn.Dense(self.dim_out, dtype=self.dtype, param_dtype=self.param_dtype)(h)
        return nn.sigmoid(h)


class FiLMBlock(nn.Module):
    """conv3 -> GroupNorm(1) -> scale-shift FiLM -> SiLU (reference residual.py:62-88)."""

    dim_out: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    quant: str = "none"

    @nn.compact
    def __call__(self, x: jnp.ndarray, scale_shift: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None) -> jnp.ndarray:
        x = MatmulConv(
            self.dim_out, kernel_size=(3,), padding=1, dtype=self.dtype, param_dtype=self.param_dtype,
            quant=self.quant, name="Conv_0"
        )(x)
        x = nn.GroupNorm(num_groups=1, epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype)(x)
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale[:, None, :] + 1) + shift[:, None, :]
        return nn.silu(x)


class ResidualBlock(nn.Module):
    """Two FiLM blocks + squeeze-excite gate + skip (reference residual.py:91-137).

    ``t``/``c`` embeddings are concatenated and projected to per-channel
    scale/shift applied inside the first block.
    """

    dim_out: int
    has_time_cond: bool = True
    use_gca: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    quant: str = "none"

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        t: Optional[jnp.ndarray] = None,
        c: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        scale_shift = None
        if self.has_time_cond and (t is not None or c is not None):
            emb = jnp.concatenate([e for e in (t, c) if e is not None], axis=-1)
            emb = nn.silu(emb)
            emb = nn.Dense(self.dim_out * 2, dtype=self.dtype, param_dtype=self.param_dtype)(emb)
            scale, shift = jnp.split(emb, 2, axis=-1)
            scale_shift = (scale, shift)

        h = FiLMBlock(self.dim_out, dtype=self.dtype, param_dtype=self.param_dtype, quant=self.quant)(x, scale_shift)
        h = FiLMBlock(self.dim_out, dtype=self.dtype, param_dtype=self.param_dtype, quant=self.quant)(h)

        gate_cls = GlobalContext if self.use_gca else SqueezeExcite
        h = h * gate_cls(self.dim_out, dtype=self.dtype, param_dtype=self.param_dtype)(h)

        if x.shape[-1] != self.dim_out:
            x = MatmulConv(self.dim_out, kernel_size=(1,), dtype=self.dtype, param_dtype=self.param_dtype, quant=self.quant, name="Conv_0")(x)
        return h + x


class Attention(nn.Module):
    """Pre-LN GQA self-attention with length-rescaled RoPE and inner residual
    (reference unet.py:104-146)."""

    dim_head: int = 64
    heads: int = 16
    kv_heads: int = 1
    context_len: int = 4096
    backend: str = "auto"
    local: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    quant: str = "none"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        with named_scope("Attention"):
            return self._attend(x)

    def _attend(self, x: jnp.ndarray) -> jnp.ndarray:
        B, T, C = x.shape
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype)(x)

        dot = quant_dot(self.quant)
        q = nn.Dense(
            self.dim_head * self.heads, use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype,
            dot_general=dot, name="to_q"
        )(x)
        kv = nn.Dense(
            self.dim_head * self.kv_heads * 2,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            dot_general=dot,
            name="to_kv",
        )(x)
        k, v = jnp.split(kv, 2, axis=-1)

        # seq-major pipeline: the (B, T, H*D) projections reshape into the
        # Pallas kernel's native (B, T, H, D) layout for FREE — the whole
        # attention path (RoPE included) runs without a single transpose
        q = q.reshape(B, T, self.heads, self.dim_head)
        k = k.reshape(B, T, self.kv_heads, self.dim_head)
        v = v.reshape(B, T, self.kv_heads, self.dim_head)

        # rope is delegated to the sdpa dispatch: on the forward-only
        # inference path it fuses into the flash kernel (no whole-tensor
        # rotate-half passes); elsewhere it applies here-equivalent XLA math
        rope = rope_tables(T, self.dim_head, scale_base=self.context_len)

        # the window only engages BEYOND the trained context: sequences up to
        # context_len attend globally — bit-identical to the reference's
        # global SDPA at training crop lengths (attention.py:94) — while
        # full-song sampling bounds each query to a context_len-wide field
        # (+/- window/2), the same receptive width training saw
        window = self.context_len if (self.local and T > self.context_len) else None
        out = sdpa(q, k, v, backend=self.backend, window=window, rope=rope)
        out = out.reshape(B, T, self.heads * self.dim_head)
        out = nn.Dense(
            C, dtype=self.dtype, param_dtype=self.param_dtype, dot_general=dot, name="to_out"
        )(out)
        return x + out


class FeedForward(nn.Module):
    """Dense -> SiLU -> Dense, mult 2 (reference unet.py:149-156)."""

    dim: int
    mult: int = 2
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    quant: str = "none"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dot = quant_dot(self.quant)
        h = nn.Dense(
            self.dim * self.mult, dtype=self.dtype, param_dtype=self.param_dtype,
            dot_general=dot,
        )(x)
        h = nn.silu(h)
        return nn.Dense(
            self.dim, dtype=self.dtype, param_dtype=self.param_dtype, dot_general=dot
        )(h)


class TransformerBlock(nn.Module):
    """Attention (inner residual) then FF residual (reference unet.py:159-183).
    Channel-last throughout: no layout transposes.

    ``remat_ff`` wraps only the FeedForward in ``jax.checkpoint`` (the
    "save-attn" remat mode): the FF hidden state (2x dim) is recomputed in
    the backward while the attention module's residuals stay saved."""

    dim: int
    ff_mult: int = 2
    attn_dim_head: int = 64
    attn_heads: int = 16
    attn_kv_heads: int = 1
    attn_context_len: int = 4096
    attn_backend: str = "auto"
    attn_local: bool = True
    remat_ff: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    quant: str = "none"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = Attention(
            dim_head=self.attn_dim_head,
            heads=self.attn_heads,
            kv_heads=self.attn_kv_heads,
            context_len=self.attn_context_len,
            backend=self.attn_backend,
            local=self.attn_local,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            quant=self.quant,
            name="attn",
        )(x)
        ff_cls = nn.remat(FeedForward) if self.remat_ff else FeedForward
        x = ff_cls(self.dim, self.ff_mult, dtype=self.dtype, param_dtype=self.param_dtype, quant=self.quant, name="ff")(x) + x
        return x

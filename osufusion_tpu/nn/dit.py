"""DiT backbone: flat diffusion transformer with adaLN-Zero conditioning.

Capability parity with reference osu_fusion/modules/dit.py (an orphan alt
backbone there, a first-class option here): input = channel-concat [x; a]
through a CrossEmbed stem (:180,:271); conditioning vector = cond MLP + time
MLP + pooled audio stats (mean||std over time -> linear, :275-285); blocks are
adaLN-Zero 6-way modulation around full MHA with per-head QK RMSNorm
(:119-159); final adaLN layer + zero-init 1x1 output conv (:218-245). No
positional encoding beyond the conv stem (the reference's DiTAttention takes a
context_len but never builds a rotary table) — replicated as-is.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from osufusion_tpu.config import ModelConfig
from osufusion_tpu.nn.blocks import CrossEmbedLayer, sinusoidal_embedding
from osufusion_tpu.ops.attention import sdpa

X_PAD_VALUE = -1.0
A_PAD_VALUE = -23.0


def modulate(x: jnp.ndarray, shift: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    return x * (1 + scale[:, None, :]) + shift[:, None, :]


class MultiHeadRMSNorm(nn.Module):
    """Per-head RMS norm with learned gamma (reference dit.py:63-70)."""

    dim: int
    heads: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (B, T, H, D)
        gamma = self.param("gamma", nn.initializers.ones, (self.heads, self.dim), self.param_dtype)
        x32 = x.astype(jnp.float32)
        normed = x32 / jnp.sqrt(jnp.sum(x32**2, axis=-1, keepdims=True) + 1e-12)
        out = normed * gamma[None, None] * (self.dim**0.5)
        return out.astype(x.dtype)


class DiTAttention(nn.Module):
    heads: int
    dim_head: int
    qk_norm: bool = True
    backend: str = "auto"
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, T, C = x.shape
        inner = self.heads * self.dim_head
        qkv = nn.Dense(inner * 3, use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype,
                       kernel_init=nn.initializers.xavier_uniform(), name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, T, self.heads, self.dim_head)
        k = k.reshape(B, T, self.heads, self.dim_head)
        v = v.reshape(B, T, self.heads, self.dim_head)
        if self.qk_norm:
            q = MultiHeadRMSNorm(self.dim_head, self.heads, self.param_dtype, name="q_norm")(q)
            k = MultiHeadRMSNorm(self.dim_head, self.heads, self.param_dtype, name="k_norm")(k)
        out = sdpa(q, k, v, backend=self.backend)
        return out.reshape(B, T, inner)


class DiTFeedForward(nn.Module):
    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.dim * self.mult, dtype=self.dtype, param_dtype=self.param_dtype,
                     kernel_init=nn.initializers.xavier_uniform())(x)
        h = nn.silu(h)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype,
                        kernel_init=nn.initializers.xavier_uniform())(h)


class DiTBlock(nn.Module):
    dim_h: int
    mult: int = 4
    attn_heads: int = 8
    attn_dim_head: int = 64
    qk_norm: bool = True
    backend: str = "auto"
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
        mod = nn.Dense(self.dim_h * 6, dtype=self.dtype, param_dtype=self.param_dtype,
                       kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
                       name="modulation")(nn.silu(c))
        s_msa, sc_msa, g_msa, s_ff, sc_ff, g_ff = jnp.split(mod, 6, axis=-1)

        norm1 = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6, dtype=self.dtype)(x)
        x = x + g_msa[:, None, :] * DiTAttention(
            self.attn_heads, self.attn_dim_head, self.qk_norm, self.backend,
            self.dtype, self.param_dtype, name="attn",
        )(modulate(norm1, s_msa, sc_msa))

        norm2 = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6, dtype=self.dtype)(x)
        x = x + g_ff[:, None, :] * DiTFeedForward(
            self.dim_h, self.mult, self.dtype, self.param_dtype, name="ff"
        )(modulate(norm2, s_ff, sc_ff))
        return x


class DiTFinalLayer(nn.Module):
    dim_h: int
    dim_out: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
        mod = nn.Dense(self.dim_h * 2, dtype=self.dtype, param_dtype=self.param_dtype,
                       kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
                       name="modulation")(nn.silu(c))
        shift, scale = jnp.split(mod, 2, axis=-1)
        x = modulate(nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6, dtype=self.dtype)(x), shift, scale)
        return nn.Dense(self.dim_out, dtype=self.dtype, param_dtype=self.param_dtype,
                        kernel_init=nn.initializers.xavier_uniform(), name="linear")(x)


class DiT(nn.Module):
    """Channel-last DiT. Same call surface as UNet: (x, a, t, c, cond_mask)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, T, 6)
        a: jnp.ndarray,  # (B, T, 96)
        t: jnp.ndarray,
        c: jnp.ndarray,
        cond_mask: Optional[jnp.ndarray] = None,
        audio_encoded: bool = False,  # DiT consumes raw audio; flag accepted for API parity
    ) -> jnp.ndarray:
        cfg = self.cfg
        # The reference's DiTAttention adds its (B, T, heads*dim_head) output
        # straight back to the residual stream with no to_out projection
        # (reference dit.py:108-116), which silently constrains the config.
        # Surface that constraint instead of a cryptic broadcast error.
        assert cfg.attn_heads * cfg.attn_dim_head == cfg.dim_h, (
            f"DiT requires attn_heads*attn_dim_head == dim_h "
            f"({cfg.attn_heads}*{cfg.attn_dim_head} != {cfg.dim_h}): the "
            "attention output feeds the residual stream without a projection"
        )
        common = dict(dtype=cfg.compute_dtype, param_dtype=cfg.params_dtype)
        dim_h = cfg.dim_h
        B, n, _ = x.shape

        x = x.astype(cfg.compute_dtype)
        a = a.astype(cfg.compute_dtype)

        h = CrossEmbedLayer(dim_h, cfg.cross_embed_kernel_sizes, **common, name="preprocess")(
            jnp.concatenate([x, a], axis=-1)
        )

        # pooled audio statistics (std matches torch's unbiased default)
        mean_f = a.mean(axis=1)
        std_f = jnp.sqrt(a.astype(jnp.float32).var(axis=1, ddof=1) + 1e-12).astype(a.dtype)
        h_a = nn.Dense(dim_h, **common, kernel_init=nn.initializers.normal(0.02), name="feature_extractor_a")(
            jnp.concatenate([mean_f, std_f], axis=-1)
        )
        h_a = nn.Dense(dim_h, **common, kernel_init=nn.initializers.normal(0.02), name="mlp_audio_0")(h_a)
        h_a = nn.Dense(dim_h, **common, kernel_init=nn.initializers.normal(0.02), name="mlp_audio_1")(nn.silu(h_a))

        t_emb = sinusoidal_embedding(t, dim_h).astype(cfg.compute_dtype)
        t_emb = nn.Dense(dim_h, use_bias=False, **common, kernel_init=nn.initializers.normal(0.02), name="mlp_time_0")(t_emb)
        t_emb = nn.Dense(dim_h, use_bias=False, **common, kernel_init=nn.initializers.normal(0.02), name="mlp_time_1")(
            nn.silu(t_emb)
        )

        c_emb = nn.Dense(dim_h, **common, kernel_init=nn.initializers.normal(0.02), name="mlp_cond_0")(
            c.astype(cfg.compute_dtype)
        )
        c_emb = nn.Dense(dim_h, **common, kernel_init=nn.initializers.normal(0.02), name="mlp_cond_1")(nn.silu(c_emb))

        null_cond = self.param("null_cond", nn.initializers.normal(1.0), (dim_h,), cfg.params_dtype)
        if cond_mask is not None:
            null = jnp.broadcast_to(null_cond.astype(c_emb.dtype), c_emb.shape)
            c_emb = jnp.where(cond_mask[:, None], c_emb, null)

        cond = c_emb + t_emb + h_a

        block = DiTBlock
        if cfg.remat:
            block = nn.remat(DiTBlock)
        for i in range(cfg.depth):
            h = block(
                dim_h,
                mult=4,
                attn_heads=cfg.attn_heads,
                attn_dim_head=cfg.attn_dim_head,
                backend=cfg.attn_backend,
                dtype=cfg.compute_dtype,
                param_dtype=cfg.params_dtype,
                name=f"block_{i}",
            )(h, cond)

        h = DiTFinalLayer(dim_h, dim_h, **common, name="final")(h, cond)
        out = nn.Dense(
            cfg.dim_in_x,
            use_bias=False,
            kernel_init=nn.initializers.zeros,
            **common,
            name="postprocess",
        )(h)
        return out[:, :n, :].astype(jnp.float32)

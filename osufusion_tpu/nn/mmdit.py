"""MMDiT backbone: SD3-style two-stream multimodal diffusion transformer.

Capability parity with reference osu_fusion/modules/mmdit.py (orphan alt
backbone there, first-class here): per-modality patch embedding (conv stride =
patch, :44-52); per-stream adaLN-Zero modulation and FFs (:143-162); joint
attention packs [audio; osu] along the sequence into ONE attention call with
per-stream q/kv projections, GQA (kv_heads=2) and per-head QK RMSNorm
(:65-127) — on TPU the packed sequence goes straight through the Pallas flash
kernel; final adaLN layer -> unpatchify -> zero-init 1x1 out conv (:225-294).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from osufusion_tpu.config import ModelConfig
from osufusion_tpu.nn.blocks import sinusoidal_embedding
from osufusion_tpu.nn.dit import DiTFeedForward, MultiHeadRMSNorm, modulate
from osufusion_tpu.ops.attention import sdpa

X_PAD_VALUE = -1.0
A_PAD_VALUE = -23.0


class PatchEmbedding(nn.Module):
    dim_emb: int
    patch_size: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # (B, T, C) -> (B, T/p, dim_emb)
        assert x.shape[1] % self.patch_size == 0, "sequence length must be divisible by the patch size"
        return nn.Conv(
            self.dim_emb,
            kernel_size=(self.patch_size,),
            strides=(self.patch_size,),
            padding="VALID",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=nn.initializers.xavier_uniform(),
        )(x)


class JointAttention(nn.Module):
    """Separate per-stream projections, one packed attention (reference :65-127).
    KV heads stay unrepeated — the GQA dispatch broadcasts them."""

    dim_head: int
    heads: int
    kv_heads: int
    qk_norm: bool = True
    backend: str = "auto"
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, a: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        B, Tx, _ = x.shape
        Ta = a.shape[1]
        dense = lambda dim, name: nn.Dense(  # noqa: E731
            dim, use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype,
            kernel_init=nn.initializers.xavier_uniform(), name=name,
        )

        q_x = dense(self.dim_head * self.heads, "to_q_x")(x).reshape(B, Tx, self.heads, self.dim_head)
        k_x = dense(self.dim_head * self.kv_heads, "to_k_x")(x).reshape(B, Tx, self.kv_heads, self.dim_head)
        v_x = dense(self.dim_head * self.kv_heads, "to_v_x")(x).reshape(B, Tx, self.kv_heads, self.dim_head)

        q_a = dense(self.dim_head * self.heads, "to_q_a")(a).reshape(B, Ta, self.heads, self.dim_head)
        k_a = dense(self.dim_head * self.kv_heads, "to_k_a")(a).reshape(B, Ta, self.kv_heads, self.dim_head)
        v_a = dense(self.dim_head * self.kv_heads, "to_v_a")(a).reshape(B, Ta, self.kv_heads, self.dim_head)

        if self.qk_norm:
            q_x = MultiHeadRMSNorm(self.dim_head, self.heads, self.param_dtype, name="q_x_norm")(q_x)
            k_x = MultiHeadRMSNorm(self.dim_head, self.kv_heads, self.param_dtype, name="k_x_norm")(k_x)
            q_a = MultiHeadRMSNorm(self.dim_head, self.heads, self.param_dtype, name="q_a_norm")(q_a)
            k_a = MultiHeadRMSNorm(self.dim_head, self.kv_heads, self.param_dtype, name="k_a_norm")(k_a)

        # pack [audio; osu] along the sequence axis (reference packs a first)
        q = jnp.concatenate([q_a, q_x], axis=1)
        k = jnp.concatenate([k_a, k_x], axis=1)
        v = jnp.concatenate([v_a, v_x], axis=1)

        out = sdpa(q, k, v, backend=self.backend)
        out_a, out_x = out[:, :Ta], out[:, Ta:]
        return (
            out_x.reshape(B, Tx, self.heads * self.dim_head),
            out_a.reshape(B, Ta, self.heads * self.dim_head),
        )


class MMDiTBlock(nn.Module):
    dim_h: int
    mult: int = 4
    attn_dim_head: int = 64
    attn_heads: int = 8
    attn_kv_heads: int = 2
    qk_norm: bool = True
    backend: str = "auto"
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, a: jnp.ndarray, c: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        zero_dense = lambda name: nn.Dense(  # noqa: E731
            self.dim_h * 6, dtype=self.dtype, param_dtype=self.param_dtype,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros, name=name,
        )
        mod_x = jnp.split(zero_dense("modulation_x")(nn.silu(c)), 6, axis=-1)
        mod_a = jnp.split(zero_dense("modulation_a")(nn.silu(c)), 6, axis=-1)
        (s_at_x, sc_at_x, g_at_x, s_ff_x, sc_ff_x, g_ff_x) = mod_x
        (s_at_a, sc_at_a, g_at_a, s_ff_a, sc_ff_a, g_ff_a) = mod_a

        ln = lambda: nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6, dtype=self.dtype)  # noqa: E731
        h_x = modulate(ln()(x), s_at_x, sc_at_x)
        h_a = modulate(ln()(a), s_at_a, sc_at_a)

        attn_x, attn_a = JointAttention(
            self.attn_dim_head, self.attn_heads, self.attn_kv_heads, self.qk_norm, self.backend,
            self.dtype, self.param_dtype, name="attn",
        )(h_x, h_a)

        proj = lambda name: nn.Dense(  # noqa: E731
            self.dim_h, use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype,
            kernel_init=nn.initializers.xavier_uniform(), name=name,
        )
        x = x + g_at_x[:, None, :] * proj("attn_out_x")(attn_x)
        a = a + g_at_a[:, None, :] * proj("attn_out_a")(attn_a)

        x = x + g_ff_x[:, None, :] * DiTFeedForward(self.dim_h, self.mult, self.dtype, self.param_dtype, name="mlp_x")(
            modulate(ln()(x), s_ff_x, sc_ff_x)
        )
        a = a + g_ff_a[:, None, :] * DiTFeedForward(self.dim_h, self.mult, self.dtype, self.param_dtype, name="mlp_a")(
            modulate(ln()(a), s_ff_a, sc_ff_a)
        )
        return x, a


class MMDiT(nn.Module):
    """Channel-last MMDiT. Same call surface as UNet: (x, a, t, c, cond_mask)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, T, 6)
        a: jnp.ndarray,  # (B, T, 96)
        t: jnp.ndarray,
        c: jnp.ndarray,
        cond_mask: Optional[jnp.ndarray] = None,
        audio_encoded: bool = False,  # consumes raw audio; flag for API parity
    ) -> jnp.ndarray:
        cfg = self.cfg
        # Like the reference's JointAttention (mmdit.py:65-127, no to_out),
        # attention output feeds the residual stream unprojected — surface
        # the heads*dim_head == dim_h constraint as a clear error.
        assert cfg.attn_heads * cfg.attn_dim_head == cfg.dim_h, (
            f"MMDiT requires attn_heads*attn_dim_head == dim_h "
            f"({cfg.attn_heads}*{cfg.attn_dim_head} != {cfg.dim_h}): the "
            "joint-attention output feeds the residual stream unprojected"
        )
        common = dict(dtype=cfg.compute_dtype, param_dtype=cfg.params_dtype)
        dim_h = cfg.dim_h
        patch = cfg.patch_size
        B, n, _ = x.shape

        x = x.astype(cfg.compute_dtype)
        a = a.astype(cfg.compute_dtype)

        # pooled audio statistics from the raw spectrogram
        mean_f = a.mean(axis=1)
        std_f = jnp.sqrt(a.astype(jnp.float32).var(axis=1, ddof=1) + 1e-12).astype(a.dtype)
        h_a = nn.Dense(dim_h, **common, kernel_init=nn.initializers.normal(0.02), name="feature_extractor_a")(
            jnp.concatenate([mean_f, std_f], axis=-1)
        )
        h_a = DiTFeedForward(dim_h, 4, cfg.compute_dtype, cfg.params_dtype, name="mlp_a")(h_a)

        pad_len = (patch - n % patch) % patch
        if pad_len:
            x = jnp.pad(x, ((0, 0), (0, pad_len), (0, 0)), constant_values=X_PAD_VALUE)
            a = jnp.pad(a, ((0, 0), (0, pad_len), (0, 0)), constant_values=A_PAD_VALUE)

        x_tok = PatchEmbedding(dim_h, patch, **common, name="emb_x")(x)
        a_tok = PatchEmbedding(dim_h, patch, **common, name="emb_a")(a)

        t_emb = sinusoidal_embedding(t, dim_h).astype(cfg.compute_dtype)
        t_emb = DiTFeedForward(dim_h, 4, cfg.compute_dtype, cfg.params_dtype, name="mlp_time")(t_emb)

        c_emb = nn.Dense(dim_h, **common, kernel_init=nn.initializers.normal(0.02), name="mlp_cond_in")(
            c.astype(cfg.compute_dtype)
        )
        c_emb = DiTFeedForward(dim_h, 4, cfg.compute_dtype, cfg.params_dtype, name="mlp_cond")(c_emb)

        null_cond = self.param("null_cond", nn.initializers.normal(1.0), (dim_h,), cfg.params_dtype)
        if cond_mask is not None:
            null = jnp.broadcast_to(null_cond.astype(c_emb.dtype), c_emb.shape)
            c_emb = jnp.where(cond_mask[:, None], c_emb, null)
        cond = c_emb + t_emb + h_a

        block = MMDiTBlock
        if cfg.remat:
            block = nn.remat(MMDiTBlock)
        for i in range(cfg.depth):
            x_tok, a_tok = block(
                dim_h,
                mult=4,
                attn_dim_head=cfg.attn_dim_head,
                attn_heads=cfg.attn_heads,
                attn_kv_heads=max(cfg.attn_kv_heads, 2),
                backend=cfg.attn_backend,
                dtype=cfg.compute_dtype,
                param_dtype=cfg.params_dtype,
                name=f"block_{i}",
            )(x_tok, a_tok, cond)

        # final adaLN layer projecting to patch * dim_h, then unpatchify
        mod = nn.Dense(
            dim_h * 2, **common, kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            name="final_modulation",
        )(nn.silu(cond))
        shift, scale = jnp.split(mod, 2, axis=-1)
        h = modulate(
            nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6, dtype=cfg.compute_dtype)(x_tok), shift, scale
        )
        h = nn.Dense(
            patch * dim_h, **common, kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            name="final_linear",
        )(h)

        # (B, T/p, p*dim_h) -> (B, T, dim_h)
        h = h.reshape(B, h.shape[1] * patch, dim_h)
        out = nn.Dense(
            cfg.dim_in_x, **common, kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros, name="out"
        )(h)
        return out[:, :n, :].astype(jnp.float32)

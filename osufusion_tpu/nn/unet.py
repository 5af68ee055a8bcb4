"""The production denoiser: a 1-D UNet with transformer blocks and a parallel
audio-encoder down-stack, conditioned on time + difficulty with CFG.

Capability parity with reference osu_fusion/modules/unet.py (UNet :321,
AudioEncoder :266, UNetBlock :186) with the same topology: CrossEmbed stems,
per-level (resnet -> transformer) x N, audio fused only at the bottleneck via
channel concat (:500), middle resnet - 3 x transformer - resnet, skip-concat up
path, global input residual, zero-init output conv (:353-354).

TPU-first differences:
- channel-last (B, T, C) end to end; no b d n <-> b n d transposes;
- ``encode_audio`` is exposed separately so samplers encode the audio ONCE
  per generation instead of once per UNet call (the reference re-runs its
  audio twin-stack inside every one of the 2 x steps CFG forwards);
- conditioning is driven by an explicit boolean ``cond_mask`` instead of
  in-module RNG, keeping the module pure under jit (CFG's unconditional
  branch is just ``cond_mask=False`` rows batched with the conditional ones);
- optional per-block rematerialization via ``jax.checkpoint`` policies.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from osufusion_tpu.config import ModelConfig
from osufusion_tpu.nn.conv import MatmulConv
from osufusion_tpu.nn.blocks import (
    CondEmbedding,
    CrossEmbedLayer,
    Downsample,
    ParallelConvOut,
    ResidualBlock,
    TimeEmbedding,
    TransformerBlock,
    Upsample,
)

X_PAD_VALUE = -1.0
A_PAD_VALUE = -23.0


def level_remat_mode(cfg: ModelConfig, level: int, audio: bool = False) -> str:
    """Effective remat mode at width level ``level`` (0 = widest). For
    remat_mode="mixed" this reads ``remat_level_modes`` (missing entries
    repeat the last); every other mode applies uniformly. The AudioEncoder
    stack (``audio=True``) can be overridden wholesale via
    ``cfg.audio_remat_mode`` — its saved attention residuals are the
    cheapest HBM to give back at long T (see config.py)."""
    if not cfg.remat:
        return "none"
    if audio and cfg.audio_remat_mode:
        return cfg.audio_remat_mode
    if cfg.remat_mode != "mixed":
        return cfg.remat_mode
    modes = cfg.remat_level_modes or ("save-attn",)
    return modes[min(level, len(modes) - 1)]


def _remat_plan(cfg: ModelConfig, level: int = 0, audio: bool = False):
    """(block_cls, remat_inner mode) for width level ``level``."""
    mode = level_remat_mode(cfg, level, audio=audio)
    if mode == "block":
        return nn.remat(UNetBlock), "none"
    if mode == "save-attn-out":
        # whole-block remat, but the policy pins the flash kernel's OUTPUTS
        # (named in ops/pallas_attention's fwd rules): the backward re-runs
        # the cheap projections/convs yet never the attention kernel itself,
        # at ~o+lse of saved bytes per site instead of save-attn's q/k/v/o.
        # This is the full-song (T=65536) level-0 mode: plain "save-attn"
        # there overshoots the 15.75 GB HBM by ~0.8 GB (measured).
        policy = jax.checkpoint_policies.save_only_these_names("flash_o", "flash_lse")
        return nn.remat(UNetBlock, policy=policy), "none"
    if mode == "ff":
        return UNetBlock, "ff"  # remat FFs only; resnets + attention saved
    if mode == "resnet":
        return UNetBlock, "resnet"  # remat resnets only; FFs + attention saved
    if mode == "resnet-dots":
        return UNetBlock, "resnet-dots"  # remat resnets, conv outputs saved
    if mode == "none":
        return UNetBlock, "none"
    return UNetBlock, "inner"  # save-attn: remat resnets+FFs, attention saved


class UNetBlock(nn.Module):
    """init resnet -> N x (resnet -> transformer) -> down/up sampler.

    Returns (sampled_x, pre_sample_x); the latter is the skip connection.

    ``remat_inner="inner"`` is the "save-attn" rematerialization mode: the
    ResidualBlocks and transformer FFs are individually wrapped in
    ``jax.checkpoint`` (cheap conv/matmul recompute) while the attention
    modules stay un-rematted, so the backward reuses the flash kernel's saved
    residuals instead of re-running its forward. ``"ff"`` remats only the
    transformer FeedForwards; ``"resnet"`` only the ResidualBlocks. The
    resnet recompute is elementwise/conv work whose intermediates stay
    inside fused XLA kernels — rematting them REMOVES the save/reload HBM
    round-trips of their GroupNorm/FiLM/SiLU chains, so "resnet" is both
    smaller AND faster than saving everything; FF recompute is real MXU
    matmul time, so "ff"/"inner" pay wall-clock for their extra savings.
    """

    dim_in: int
    dim_out: int
    has_time_cond: bool
    layer_idx: int
    num_layers: int
    num_blocks: int
    down_block: bool
    attn_dim_head: int
    attn_heads: int
    attn_kv_heads: int
    attn_context_len: int
    attn_backend: str = "auto"
    attn_local: bool = True
    remat_inner: str = "none"  # "none" | "inner" (resnets+FFs) | "ff" | "resnet"
    quant: str = "none"
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        t: Optional[jnp.ndarray] = None,
        c: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        if self.remat_inner in ("inner", "resnet"):
            res_cls = nn.remat(ResidualBlock)
        elif self.remat_inner == "resnet-dots":
            import jax

            res_cls = nn.remat(ResidualBlock, policy=jax.checkpoint_policies.dots_saveable)
        else:
            res_cls = ResidualBlock

        x = res_cls(self.dim_in, has_time_cond=self.has_time_cond, quant=self.quant, **common, name="init_resnet")(x, t, c)
        for i in range(self.num_blocks):
            x = res_cls(self.dim_in, has_time_cond=self.has_time_cond, quant=self.quant, **common, name=f"resnet_{i}")(x, t, c)
            x = TransformerBlock(
                self.dim_in,
                attn_dim_head=self.attn_dim_head,
                attn_heads=self.attn_heads,
                attn_kv_heads=self.attn_kv_heads,
                attn_context_len=self.attn_context_len,
                attn_backend=self.attn_backend,
                attn_local=self.attn_local,
                remat_ff=self.remat_inner in ("inner", "ff"),
                quant=self.quant,
                **common,
                name=f"transformer_{i}",
            )(x)

        if self.layer_idx < self.num_layers - 1:
            sampler_cls = Downsample if self.down_block else Upsample
        else:
            sampler_cls = ParallelConvOut
        sampled = sampler_cls(self.dim_out, quant=self.quant, **common, name="sampler")(x)
        return sampled, x


class AudioEncoder(nn.Module):
    """Parallel down-stack for the spectrogram (reference unet.py:266-318):
    same block topology as the UNet's down path, no time/cond embedding.

    NOTE: the reference UNet never forwards ``attn_context_len`` to its
    AudioEncoder (unet.py:343-352), so the audio stack always uses the class
    default 4096 regardless of the configured context — replicated here via
    ``AUDIO_ATTN_CONTEXT_LEN`` for weight/behavior parity (identical to the
    trunk at the production config, which uses 4096 anyway)."""

    AUDIO_ATTN_CONTEXT_LEN = 4096

    cfg: ModelConfig

    @nn.compact
    def __call__(self, a: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        common = dict(dtype=cfg.compute_dtype, param_dtype=cfg.params_dtype)

        x = CrossEmbedLayer(cfg.dim_h, cfg.cross_embed_kernel_sizes, quant=cfg.quant, **common, name="init_conv")(a)

        dims_h = (cfg.dim_h, *[cfg.dim_h * m for m in cfg.dim_h_mult])
        n_layers = len(cfg.dim_h_mult)
        for i in range(n_layers):
            block_cls, remat_inner = _remat_plan(cfg, i, audio=True)
            x, _ = block_cls(
                dim_in=dims_h[i],
                dim_out=dims_h[i + 1],
                has_time_cond=False,
                layer_idx=i,
                num_layers=n_layers,
                num_blocks=cfg.num_layer_blocks[i],
                down_block=True,
                attn_dim_head=cfg.attn_dim_head,
                attn_heads=cfg.attn_heads,
                attn_kv_heads=cfg.attn_kv_heads,
                attn_context_len=self.AUDIO_ATTN_CONTEXT_LEN // (2**i),
                attn_backend=cfg.attn_backend,
                attn_local=cfg.attn_local,
                remat_inner=remat_inner,
                quant=cfg.quant,
                **common,
                name=f"layer_{i}",
            )(x, None, None)
        return x


class UNet(nn.Module):
    """Inputs are channel-last: x (B, T, 6), a (B, T, 96) or pre-encoded
    (B, T/2^(depth-1), dim_h*mult[-1]), t (B,), c (B, 5), cond_mask (B,) bool.
    """

    cfg: ModelConfig

    def setup(self) -> None:
        cfg = self.cfg
        common = dict(dtype=cfg.compute_dtype, param_dtype=cfg.params_dtype)
        dim_emb = cfg.dim_h * 4

        self.init_x = CrossEmbedLayer(cfg.dim_h, cfg.cross_embed_kernel_sizes, quant=cfg.quant, **common, name="init_x")
        self.audio_encoder = AudioEncoder(cfg, name="audio_encoder")
        self.time_mlp = TimeEmbedding(dim_emb, **common, name="time_mlp")
        self.cond_mlp = CondEmbedding(dim_emb, **common, name="cond_mlp")
        self.null_cond = self.param("null_cond", nn.initializers.normal(1.0), (dim_emb,), cfg.params_dtype)

        dims_h = (cfg.dim_h, *[cfg.dim_h * m for m in cfg.dim_h_mult])
        n_layers = len(cfg.dim_h_mult)

        self.down_layers = [
            _remat_plan(cfg, i)[0](
                dim_in=dims_h[i],
                dim_out=dims_h[i + 1],
                has_time_cond=True,
                layer_idx=i,
                num_layers=n_layers,
                num_blocks=cfg.num_layer_blocks[i],
                down_block=True,
                attn_dim_head=cfg.attn_dim_head,
                attn_heads=cfg.attn_heads,
                attn_kv_heads=cfg.attn_kv_heads,
                attn_context_len=cfg.attn_context_len // (2**i),
                attn_backend=cfg.attn_backend,
                attn_local=cfg.attn_local,
                remat_inner=_remat_plan(cfg, i)[1],
                quant=cfg.quant,
                **common,
                name=f"down_{i}",
            )
            for i in range(n_layers)
        ]
        mid_inner = _remat_plan(cfg, n_layers - 1)[1]

        bottleneck_ctx = cfg.attn_context_len // (2 ** (n_layers - 1))
        self.middle_resnet1 = ResidualBlock(dims_h[-1], quant=cfg.quant, **common, name="middle_resnet1")
        self.middle_transformers = [
            TransformerBlock(
                dims_h[-1],
                attn_dim_head=cfg.attn_dim_head,
                attn_heads=cfg.attn_heads,
                attn_kv_heads=cfg.attn_kv_heads,
                attn_context_len=bottleneck_ctx,
                attn_backend=cfg.attn_backend,
                attn_local=cfg.attn_local,
                remat_ff=mid_inner in ("inner", "ff"),
                quant=cfg.quant,
                **common,
                name=f"middle_transformer_{i}",
            )
            for i in range(cfg.num_middle_transformers)
        ]
        self.middle_resnet2 = ResidualBlock(dims_h[-1], quant=cfg.quant, **common, name="middle_resnet2")

        in_out_rev = list(reversed(list(zip(dims_h[:-1], dims_h[1:]))))
        blocks_rev = tuple(reversed(cfg.num_layer_blocks))
        # up layer i sits at width level n_layers-1-i (i = n_layers-1 is the
        # widest): its remat mode follows that level's plan
        self.up_layers = [
            _remat_plan(cfg, n_layers - 1 - i)[0](
                dim_in=layer_dim_in,
                dim_out=layer_dim_out,
                has_time_cond=True,
                layer_idx=i,
                num_layers=n_layers,
                num_blocks=blocks_rev[i],
                down_block=False,
                attn_dim_head=cfg.attn_dim_head,
                attn_heads=cfg.attn_heads,
                attn_kv_heads=cfg.attn_kv_heads,
                attn_context_len=cfg.attn_context_len // (2 ** (n_layers - i - 1)),
                attn_backend=cfg.attn_backend,
                attn_local=cfg.attn_local,
                remat_inner=_remat_plan(cfg, n_layers - 1 - i)[1],
                quant=cfg.quant,
                **common,
                name=f"up_{i}",
            )
            for i, (layer_dim_out, layer_dim_in) in enumerate(in_out_rev)
        ]

        self.final_resnet = ResidualBlock(cfg.dim_h, quant=cfg.quant, **common, name="final_resnet")
        self.final_conv = MatmulConv(
            cfg.dim_in_x,
            kernel_size=(1,),
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=cfg.compute_dtype,
            param_dtype=cfg.params_dtype,
            quant=cfg.quant,
            name="final_conv",
        )

    def encode_audio(self, a: jnp.ndarray) -> jnp.ndarray:
        """(B, T, 96) spectrogram -> bottleneck features (B, T/2^(d-1), top_dim).

        Pads T to a multiple of 2^depth with the canonical silence value first.
        """
        n = a.shape[1]
        pad_len = self._pad_len(n)
        if pad_len:
            a = jnp.pad(a, ((0, 0), (0, pad_len), (0, 0)), constant_values=A_PAD_VALUE)
        return self.audio_encoder(a.astype(self.cfg.compute_dtype))

    def _pad_len(self, n: int) -> int:
        mult = 2 ** len(self.cfg.dim_h_mult)
        return (mult - n % mult) % mult

    def __call__(
        self,
        x: jnp.ndarray,
        a: jnp.ndarray,
        t: jnp.ndarray,
        c: jnp.ndarray,
        cond_mask: Optional[jnp.ndarray] = None,
        audio_encoded: bool = False,
    ) -> jnp.ndarray:
        cfg = self.cfg
        n = x.shape[1]
        pad_len = self._pad_len(n)
        if pad_len:
            x = jnp.pad(x, ((0, 0), (0, pad_len), (0, 0)), constant_values=X_PAD_VALUE)

        x = x.astype(cfg.compute_dtype)
        a_enc = a if audio_encoded else self.encode_audio(a)

        x = self.init_x(x)
        r = x

        t_emb = self.time_mlp(t)
        c_emb = self.cond_mlp(c.astype(cfg.compute_dtype))
        if cond_mask is not None:
            null = jnp.broadcast_to(self.null_cond.astype(c_emb.dtype), c_emb.shape)
            c_emb = jnp.where(cond_mask[:, None], c_emb, null)

        skips = []
        for layer in self.down_layers:
            x, skip = layer(x, t_emb, c_emb)
            skips.append(skip)

        x = jnp.concatenate([x, a_enc.astype(x.dtype)], axis=-1)
        x = self.middle_resnet1(x, t_emb, c_emb)
        for block in self.middle_transformers:
            x = block(x)
        x = self.middle_resnet2(x, t_emb, c_emb)

        for layer, skip in zip(self.up_layers, reversed(skips)):
            x = jnp.concatenate([x, skip], axis=-1)
            x, _ = layer(x, t_emb, c_emb)

        x = jnp.concatenate([x, r], axis=-1)
        x = self.final_resnet(x, t_emb, c_emb)
        out = self.final_conv(x)
        return out[:, :n, :].astype(jnp.float32)

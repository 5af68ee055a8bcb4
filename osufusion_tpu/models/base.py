"""Shared wrapper plumbing for the generative models.

The public surface mirrors the reference's ``OsuFusion`` wrappers
(osu_fusion/models/{diffusion,rectified_flow}.py): channel-first (B, C, N)
tensors at the API edge, ``forward -> loss`` and ``sample``. Internally
everything is channel-last and functional: methods take ``params`` explicitly
and are jit/pjit-friendly pure functions.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from osufusion_tpu.config import DiffusionConfig, ModelConfig
from osufusion_tpu.nn.unet import UNet


def to_channel_last(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.swapaxes(x, -1, -2)


def to_channel_first(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.swapaxes(x, -1, -2)


def masked_mse(pred: jnp.ndarray, target: jnp.ndarray, orig_len: Optional[jnp.ndarray]) -> jnp.ndarray:
    """MSE over valid frames only (reference diffusion.py:100-111).

    Returns (numerator, denominator) reduced over the WHOLE array so that under
    pjit the division happens after the global reduction — exact parity across
    any data sharding (the reference normalizes per process, which differs
    between 1-GPU and DDP runs; see SURVEY.md section 5.8).
    """
    se = (pred - target) ** 2  # (B, T, C)
    if orig_len is None:
        return se.mean()
    B, T, C = se.shape
    mask = (jnp.arange(T)[None, :] < orig_len[:, None]).astype(se.dtype)  # (B, T)
    num = jnp.sum(se * mask[..., None])
    den = jnp.sum(mask) * C
    return num / jnp.maximum(den, 1.0)


class GenerativeModel:
    """Base: owns the denoiser module (UNet/DiT/MMDiT) and parameter init."""

    def __init__(self, model_cfg: ModelConfig, diffusion_cfg: DiffusionConfig) -> None:
        self.model_cfg = model_cfg
        self.cfg = diffusion_cfg
        if model_cfg.backbone == "unet":
            self.unet = UNet(model_cfg)
        elif model_cfg.backbone == "dit":
            from osufusion_tpu.nn.dit import DiT

            self.unet = DiT(model_cfg)
        elif model_cfg.backbone == "mmdit":
            from osufusion_tpu.nn.mmdit import MMDiT

            self.unet = MMDiT(model_cfg)
        else:
            raise ValueError(f"unknown backbone: {model_cfg.backbone}")
        # only the UNet has a separable audio encoder to hoist out of samplers
        self.has_audio_encoder = model_cfg.backbone == "unet"

    def encode_audio_cl(self, params, a_cl: jnp.ndarray) -> jnp.ndarray:
        """Channel-last audio -> features reused across sampling steps.
        Identity for backbones that consume the raw spectrogram each step."""
        if self.has_audio_encoder:
            return self.unet.apply(params, a_cl, method=UNet.encode_audio)
        return a_cl

    def init_params(self, rng: jax.Array, seq_len: int = 32, batch: int = 1):
        # parameters do not depend on sequence length: a 32-frame dummy keeps
        # the (single-core host) init forward negligible
        x = jnp.zeros((batch, seq_len, self.model_cfg.dim_in_x))
        a = jnp.zeros((batch, seq_len, self.model_cfg.dim_in_a))
        t = jnp.zeros((batch,))
        c = jnp.zeros((batch, self.model_cfg.dim_in_c))
        mask = jnp.ones((batch,), dtype=bool)
        # init on the host CPU backend: unjitted init dispatches hundreds of
        # tiny ops, which is pathological over a remote-device link, and init
        # math is trivial; jit makes it one program either way
        from osufusion_tpu.ops.attention import force_xla_attention

        try:
            cpu = jax.local_devices(backend="cpu")[0]
        except RuntimeError:
            cpu = None
        with force_xla_attention():
            if cpu is not None:
                with jax.default_device(cpu):
                    params = jax.jit(self.unet.init, backend="cpu")(rng, x, a, t, c, mask)
                # land on a LOCAL accelerator device (in a multi-host run the
                # global jax.devices()[0] is not addressable from process>0);
                # shard_state then lays params onto the global mesh
                default = jax.local_devices()[0]
                if default != cpu:
                    params = jax.device_put(params, default)
                return params
            return jax.jit(self.unet.init)(rng, x, a, t, c, mask)

    def encode_audio(self, params, a_cf: jnp.ndarray) -> jnp.ndarray:
        """(B, 96, N) -> reusable audio features (channel-last)."""
        return self.encode_audio_cl(params, to_channel_last(a_cf))

    def _cfg_eps(
        self,
        params,
        x: jnp.ndarray,  # (B, T, C) channel-last
        a_enc: jnp.ndarray,
        t: jnp.ndarray,  # (B,)
        c: jnp.ndarray,
        cond_scale: float,
    ) -> jnp.ndarray:
        """Classifier-free-guided prediction. For scale != 1 the conditional
        and unconditional branches run as ONE doubled batch (better MXU
        utilization than the reference's two sequential forwards,
        unet.py:458-465)."""
        B = x.shape[0]
        if cond_scale == 1.0:
            return self.unet.apply(
                params, x, a_enc, t, c, jnp.ones((B,), dtype=bool), audio_encoded=True
            )
        x2 = jnp.concatenate([x, x], axis=0)
        a2 = jnp.concatenate([a_enc, a_enc], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        c2 = jnp.concatenate([c, c], axis=0)
        mask = jnp.concatenate([jnp.ones((B,), dtype=bool), jnp.zeros((B,), dtype=bool)])
        out = self.unet.apply(params, x2, a2, t2, c2, mask, audio_encoded=True)
        cond, uncond = out[:B], out[B:]
        return uncond + (cond - uncond) * cond_scale

"""DDIM diffusion model: epsilon-prediction objective + compiled sampler.

Capability parity with reference osu_fusion/models/diffusion.py — same
objective (t ~ U{0..999}, add_noise, MSE vs noise with padding mask,
cond_drop_prob 0.5, :79-111) and the same 35-step DDIM sampler with CFG
default 7.0 (:59-77) — but the entire sampling loop is ONE ``lax.scan`` over
timesteps with the audio encoded once up front and CFG batched, so a full-song
generation is a single XLA program instead of 2 x steps Python-dispatched
UNet calls.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from osufusion_tpu.models import ddim
from osufusion_tpu.models.base import GenerativeModel, masked_mse, to_channel_first, to_channel_last


class DiffusionModel(GenerativeModel):
    def __init__(self, model_cfg, diffusion_cfg) -> None:
        super().__init__(model_cfg, diffusion_cfg)
        self.acp = ddim.alphas_cumprod(
            diffusion_cfg.train_timesteps, diffusion_cfg.beta_start, diffusion_cfg.beta_end
        )

    # ------------------------------------------------------------------ loss

    def loss(
        self,
        params,
        rng: jax.Array,
        x: jnp.ndarray,  # (B, 6, N) channel-first, API parity with the reference
        a: jnp.ndarray,  # (B, 96, N)
        c: jnp.ndarray,  # (B, 5)
        orig_len: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        assert x.shape[-1] == a.shape[-1], "x and a must have the same sequence length"
        x = to_channel_last(x)
        a = to_channel_last(a)
        B = x.shape[0]

        rng_noise, rng_t, rng_drop = jax.random.split(rng, 3)
        noise = jax.random.normal(rng_noise, x.shape, dtype=x.dtype)
        t = jax.random.randint(rng_t, (B,), 0, self.cfg.train_timesteps)
        x_noisy = ddim.add_noise(x, noise, t, self.acp)

        cond_mask = jax.random.bernoulli(rng_drop, 1.0 - self.cfg.cond_drop_prob, (B,))
        pred = self.unet.apply(params, x_noisy, a, t, c, cond_mask)

        return masked_mse(pred, noise, orig_len)

    # ---------------------------------------------------------------- sample

    @partial(jax.jit, static_argnames=("self", "cond_scale", "sampling_timesteps", "method"))
    def sample(
        self,
        params,
        a: jnp.ndarray,  # (B, 96, N)
        c: jnp.ndarray,  # (B, 5)
        x: Optional[jnp.ndarray] = None,  # (B, 6, N) initial noise
        rng: Optional[jax.Array] = None,
        cond_scale: float = 7.0,
        sampling_timesteps: Optional[int] = None,
        method: str = "ddim",
    ) -> jnp.ndarray:
        """``method="ddim"`` reproduces the reference sampler; ``"dpmpp-2m"``
        solves the same ODE with DPM-Solver++(2M) (models/dpm.py) — same
        checkpoint, ~half the steps for the same trajectory accuracy."""
        B, _, N = a.shape
        if x is None:
            assert rng is not None, "provide either initial noise x or an rng"
            x = jax.random.normal(rng, (B, self.model_cfg.dim_in_x, N), dtype=jnp.float32)
        x = to_channel_last(x)

        steps = sampling_timesteps or self.cfg.sampling_timesteps

        from osufusion_tpu.ops.pallas_attention import inference_attention

        with inference_attention():
            if method == "dpmpp-2m":
                from osufusion_tpu.models.dpm import dpmpp_timesteps

                ts = dpmpp_timesteps(steps, np.asarray(self.acp, np.float64))
                return self._sample_scan_dpm(params, x, a, c, cond_scale, ts)
            if method != "ddim":
                raise ValueError(f"unknown sampling method: {method!r}")
            ts = ddim.ddim_timesteps(self.cfg.train_timesteps, steps)
            ts_prev = np.concatenate([ts[1:], [-1]])
            return self._sample_scan(params, x, a, c, cond_scale, ts, ts_prev)

    def _sample_scan(self, params, x, a, c, cond_scale, ts, ts_prev):
        B = x.shape[0]
        # encode the spectrogram ONCE for the whole trajectory
        a_enc = self.encode_audio_cl(params, to_channel_last(a))

        acp = self.acp
        clip = self.cfg.clip_sample

        def body(x, t_pair):
            t, t_prev = t_pair
            t_b = jnp.full((B,), t, dtype=jnp.float32)
            eps = self._cfg_eps(params, x, a_enc, t_b, c, cond_scale)
            x = ddim.ddim_step(x, eps, t, t_prev, acp, clip)
            return x, None

        x, _ = jax.lax.scan(body, x, (jnp.asarray(ts), jnp.asarray(ts_prev)))
        return to_channel_first(x)

    def _sample_scan_dpm(self, params, x, a, c, cond_scale, ts):
        from osufusion_tpu.models.dpm import dpmpp_2m_coeffs

        B = x.shape[0]
        a_enc = self.encode_audio_cl(params, to_channel_last(a))
        coeffs = jnp.asarray(dpmpp_2m_coeffs(ts, np.asarray(self.acp, np.float64)))
        clip = self.cfg.clip_sample

        def body(carry, row):
            x, m1 = carry
            t, alpha_t, sigma_t, c_x, c_d, w1 = row
            t_b = jnp.full((B,), t, dtype=jnp.float32)
            eps = self._cfg_eps(params, x, a_enc, t_b, c, cond_scale)
            m0 = (x - sigma_t * eps) / alpha_t
            if clip:
                m0 = jnp.clip(m0, -1.0, 1.0)
            x = c_x * x + c_d * ((1.0 + w1) * m0 - w1 * m1)
            return (x, m0), None

        (x, _), _ = jax.lax.scan(body, (x, jnp.zeros_like(x)), coeffs)
        return to_channel_first(x)

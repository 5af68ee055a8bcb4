"""Rectified-flow model: cosmap-warped flow matching + fixed-grid midpoint ODE.

Capability parity with reference osu_fusion/models/rectified_flow.py — same
objective (t ~ U(0,1) warped by cosmap, x_t = t x + (1-t) noise, target flow
x - noise, masked MSE, :81-111) and the same sampler semantics: the reference
runs torchdiffeq's ``odeint(method="midpoint")`` on a fixed 16-point grid,
which for a fixed grid is exactly the classic midpoint rule — so our
``lax.scan`` midpoint integrator is step-for-step equivalent (:57-79) while
compiling to one XLA program with audio encoded once and CFG batched.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from osufusion_tpu.models.base import GenerativeModel, masked_mse, to_channel_first, to_channel_last


def cosmap(t: jnp.ndarray) -> jnp.ndarray:
    """Cosine time-warp 1 - 1/(tan(pi t / 2) + 1) (reference :15-16)."""
    return 1.0 - 1.0 / (jnp.tan(jnp.pi / 2 * t) + 1.0)


class RectifiedFlowModel(GenerativeModel):
    DEFAULT_SAMPLING_TIMESTEPS = 16
    DEFAULT_CFG_SCALE = 2.0

    # ------------------------------------------------------------------ loss

    def loss(
        self,
        params,
        rng: jax.Array,
        x: jnp.ndarray,  # (B, 6, N)
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
        times = jax.random.uniform(rng_t, (B,))
        t_warp = cosmap(times)[:, None, None]

        x_noisy = t_warp * x + (1.0 - t_warp) * noise
        flow = x - noise

        cond_mask = jax.random.bernoulli(rng_drop, 1.0 - self.cfg.cond_drop_prob, (B,))
        pred = self.unet.apply(params, x_noisy, a, times, c, cond_mask)

        return masked_mse(pred, flow, orig_len)

    # ---------------------------------------------------------------- sample

    @partial(jax.jit, static_argnames=("self", "cond_scale", "sampling_timesteps", "method"))
    def sample(
        self,
        params,
        a: jnp.ndarray,  # (B, 96, N)
        c: jnp.ndarray,  # (B, 5)
        x: Optional[jnp.ndarray] = None,
        rng: Optional[jax.Array] = None,
        cond_scale: float = DEFAULT_CFG_SCALE,
        sampling_timesteps: Optional[int] = None,
        method: str = "midpoint",
    ) -> jnp.ndarray:
        if method != "midpoint":
            raise ValueError(f"rectified flow only supports method='midpoint', got {method!r}")
        B, _, N = a.shape
        if x is None:
            assert rng is not None, "provide either initial noise x or an rng"
            x = jax.random.normal(rng, (B, self.model_cfg.dim_in_x, N), dtype=jnp.float32)
        x = to_channel_last(x)

        steps = sampling_timesteps or self.DEFAULT_SAMPLING_TIMESTEPS
        times = jnp.linspace(0.0, 1.0, steps)

        from osufusion_tpu.ops.pallas_attention import inference_attention

        with inference_attention():
            return self._sample_scan(params, x, a, c, cond_scale, times)

    def _sample_scan(self, params, x, a, c, cond_scale, times):
        B = x.shape[0]
        a_enc = self.encode_audio_cl(params, to_channel_last(a))

        def f(x, t_scalar):
            t_b = jnp.full((B,), t_scalar, dtype=jnp.float32)
            return self._cfg_eps(params, x, a_enc, t_b, c, cond_scale)

        def body(x, t_pair):
            t0, t1 = t_pair
            dt = t1 - t0
            k1 = f(x, t0)
            k2 = f(x + 0.5 * dt * k1, t0 + 0.5 * dt)
            return x + dt * k2, None

        x, _ = jax.lax.scan(body, x, (times[:-1], times[1:]))
        return to_channel_first(x)

"""DDIM scheduler math, implemented from first principles.

The reference delegates to diffusers' ``DDIMScheduler`` with a linear beta
schedule, 1000 train steps, epsilon prediction, leading timestep spacing and
sample clipping (reference osu_fusion/models/diffusion.py:48-53). We implement
the same update rule directly as pure jnp functions so the whole sampling loop
compiles into a single ``lax.scan``:

  x0_hat = (x_t - sqrt(1 - a_t) * eps) / sqrt(a_t)          (clipped to [-1,1])
  x_{t_prev} = sqrt(a_prev) * x0_hat + sqrt(1 - a_prev) * eps

with a_prev = alpha_cumprod[t_prev] and alpha_cumprod[-1] := 1 (eta = 0,
deterministic DDIM).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def alphas_cumprod(train_timesteps: int, beta_start: float = 0.0001, beta_end: float = 0.02) -> jnp.ndarray:
    betas = np.linspace(beta_start, beta_end, train_timesteps, dtype=np.float64)
    acp = np.cumprod(1.0 - betas)
    return jnp.asarray(acp, dtype=jnp.float32)


def ddim_timesteps(train_timesteps: int, sampling_timesteps: int) -> np.ndarray:
    """Leading spacing: [.., 2r, r, 0] descending (diffusers-compatible)."""
    step_ratio = train_timesteps // sampling_timesteps
    ts = (np.arange(sampling_timesteps) * step_ratio).round().astype(np.int64)
    return ts[::-1].copy()


def add_noise(x: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray, acp: jnp.ndarray) -> jnp.ndarray:
    """q(x_t | x_0): sqrt(a_t) x + sqrt(1-a_t) noise. t: (B,) int."""
    a_t = acp[t]
    while a_t.ndim < x.ndim:
        a_t = a_t[..., None]
    return jnp.sqrt(a_t) * x + jnp.sqrt(1.0 - a_t) * noise


def ddim_step(
    x: jnp.ndarray,
    eps: jnp.ndarray,
    t: jnp.ndarray,
    t_prev: jnp.ndarray,
    acp: jnp.ndarray,
    clip_sample: bool = True,
) -> jnp.ndarray:
    """One deterministic DDIM update from timestep t to t_prev (t_prev < 0
    means the final step, alpha_prev = 1)."""
    a_t = acp[t]
    a_prev = jnp.where(t_prev >= 0, acp[jnp.maximum(t_prev, 0)], jnp.ones_like(a_t))

    sqrt_a_t = jnp.sqrt(a_t)
    sqrt_1m_a_t = jnp.sqrt(1.0 - a_t)

    x0 = (x - sqrt_1m_a_t * eps) / sqrt_a_t
    if clip_sample:
        x0 = jnp.clip(x0, -1.0, 1.0)

    return jnp.sqrt(a_prev) * x0 + jnp.sqrt(1.0 - a_prev) * eps

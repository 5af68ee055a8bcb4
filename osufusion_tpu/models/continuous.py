"""Continuous-time Gaussian diffusion (logSNR parameterization).

Capability parity with reference osu_fusion/modules/scheduler.py (an orphan
there, part of the capability surface): linear-beta and cosine logSNR
schedules (:11-19), alpha/sigma from sigmoid(logSNR) (:22-23), forward
``q_sample`` (:96-113), DDPM posterior ``q_posterior`` (:73-94) and
``predict_start_from_noise`` (:115-123) — as pure jnp functions plus a thin
class with the reference's method surface.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def right_pad_dims_to(x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    padding_dims = x.ndim - t.ndim
    if padding_dims <= 0:
        return t
    return t.reshape(*t.shape, *((1,) * padding_dims))


def beta_linear_log_snr(t: jnp.ndarray) -> jnp.ndarray:
    return -jnp.log(jnp.expm1(1e-4 + 10 * (t**2)))


def alpha_cosine_log_snr(t: jnp.ndarray, s: float = 0.008) -> jnp.ndarray:
    res = (jnp.cos((t + s) / (1 + s) * math.pi * 0.5) ** -2) - 1
    return -jnp.log(jnp.clip(res, a_min=1e-8))


def log_snr_to_alpha_sigma(log_snr: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    return jnp.sqrt(jax.nn.sigmoid(log_snr)), jnp.sqrt(jax.nn.sigmoid(-log_snr))


class GaussianDiffusionContinuousTimes:
    def __init__(self, noise_schedule: str = "linear", timesteps: int = 1000) -> None:
        if noise_schedule == "linear":
            self.log_snr = beta_linear_log_snr
        elif noise_schedule == "cosine":
            self.log_snr = alpha_cosine_log_snr
        else:
            raise ValueError(f"Unknown noise schedule: {noise_schedule}")
        self.timesteps = timesteps

    def get_times(self, batch_size: int, noise_level: float) -> jnp.ndarray:
        return jnp.full((batch_size,), noise_level, dtype=jnp.float32)

    def sample_random_times(self, rng: jax.Array, batch_size: int) -> jnp.ndarray:
        return jax.random.uniform(rng, (batch_size,), dtype=jnp.float32)

    def get_condition(self, t: jnp.ndarray) -> jnp.ndarray:
        return self.log_snr(t)

    def get_sampling_timesteps(self, batch_size: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(t, t_next) pairs walking 1 -> 0 in ``timesteps`` strides, each
        (steps, batch)."""
        times = jnp.linspace(1.0, 0.0, self.timesteps + 1, dtype=jnp.float32)
        times = jnp.broadcast_to(times, (batch_size, self.timesteps + 1))
        return times[:, :-1].T, times[:, 1:].T

    def q_posterior(
        self,
        x_0: jnp.ndarray,
        x_t: jnp.ndarray,
        t: jnp.ndarray,
        t_next: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        if t_next is None:
            t_next = jnp.clip(t - 1.0 / self.timesteps, a_min=0.0)

        log_snr = right_pad_dims_to(x_t, self.log_snr(t))
        log_snr_next = right_pad_dims_to(x_t, self.log_snr(t_next))

        alpha, _ = log_snr_to_alpha_sigma(log_snr)
        alpha_next, sigma_next = log_snr_to_alpha_sigma(log_snr_next)

        c = -jnp.expm1(log_snr - log_snr_next)
        posterior_mean = alpha_next * (x_t * (1 - c) / alpha + c * x_0)
        posterior_variance = (sigma_next**2) * c
        posterior_log_variance = jnp.log(jnp.clip(posterior_variance, a_min=1e-20))
        return posterior_mean, posterior_variance, posterior_log_variance

    def q_sample(
        self,
        x_0: jnp.ndarray,
        t: jnp.ndarray | float,
        noise: jnp.ndarray,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        if isinstance(t, float):
            t = jnp.full((x_0.shape[0],), t, dtype=x_0.dtype)
        log_snr = self.log_snr(t).astype(x_0.dtype)
        log_snr_padded = right_pad_dims_to(x_0, log_snr)
        alpha, sigma = log_snr_to_alpha_sigma(log_snr_padded)
        return alpha * x_0 + sigma * noise, log_snr, alpha, sigma

    def predict_start_from_noise(self, x_t: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
        log_snr = right_pad_dims_to(x_t, self.log_snr(t))
        alpha, sigma = log_snr_to_alpha_sigma(log_snr)
        return (x_t - sigma * noise) / jnp.clip(alpha, a_min=1e-8)

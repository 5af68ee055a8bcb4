"""Variable-Q transform (log-VQT) as a single strided filterbank convolution.

The reference computes its 96-bin log-VQT with librosa's recursive
multi-resolution algorithm on CPU (reference osu_fusion/scripts/
dataset_creator.py:36-55). That algorithm is a poor fit for TPU (recursive
resampling, FFT convolution, dynamic per-octave lengths). This module instead
formulates the VQT the TPU-native way:

  1. Precompute a bank of 96 complex analytic wavelets (Hann-windowed complex
     exponentials). Variable-Q bandwidths follow the same Glasberg-Moore ERB
     gamma as librosa's default (``gamma = 24.7 * alpha / 0.108``), which caps
     the longest filter at ~1.6 k samples — so ONE fixed window length covers
     every bin and the whole transform becomes a single strided convolution.
  2. Run it as hop-aligned block matmuls: the signal reshapes for free into
     (n, hop) blocks, each output frame is a sum of 12 consecutive blocks
     contracted with the matching kernel chunk — 12 dense (T, hop) x
     (hop, 2*bins) matmuls that map straight onto the MXU. (A strided
     ``lax.conv`` computes the same thing ~50x slower on TPU: XLA lowers it
     to a sliding-window gather instead of matmuls.)

Normalization: kernels are L1-normalized, so a unit-amplitude tone at a bin's
center frequency yields a magnitude response of ~0.5 at that bin regardless of
frequency, and silence maps to log(1e-10) = -23.03 exactly as the reference's
padding convention expects.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from osufusion_tpu.audio.constants import AUDIO_DIM, FMIN, HOP_LENGTH, OCTAVE_BINS, SR

# alpha: relative bandwidth per bin for bins_per_octave spacing
_R = 2.0 ** (1.0 / OCTAVE_BINS)
ALPHA = (_R**2 - 1) / (_R**2 + 1)
# Variable-Q gamma (ERB-motivated, same default as librosa.vqt(gamma=None))
GAMMA = 24.7 * ALPHA / 0.108
Q = 1.0 / ALPHA

# Fixed analysis window: the longest filter is Q*sr/(FMIN + GAMMA/ALPHA) ~ 1.56k
# samples. The window is a whole number of hops so frames align with a free
# reshape of the signal into (n, hop) blocks; the kernel center sits on a hop
# boundary for the same reason.
WINDOW_BLOCKS = 12
WINDOW_LENGTH = WINDOW_BLOCKS * HOP_LENGTH  # 2112
WINDOW_CENTER = (WINDOW_BLOCKS // 2) * HOP_LENGTH  # 1056


def bin_frequencies() -> np.ndarray:
    return FMIN * 2.0 ** (np.arange(AUDIO_DIM) / OCTAVE_BINS)


def filter_lengths() -> np.ndarray:
    freqs = bin_frequencies()
    return np.minimum(Q * SR / (freqs + GAMMA / ALPHA), WINDOW_LENGTH)


@lru_cache(maxsize=1)
def vqt_kernels() -> np.ndarray:
    """(2 * AUDIO_DIM, WINDOW_LENGTH) float32 bank: real rows then imag rows.

    Each kernel is a Hann-windowed complex exponential of its own effective
    length, centered in the fixed window, L1-normalized.
    """
    freqs = bin_frequencies()
    lengths = filter_lengths()
    t = np.arange(WINDOW_LENGTH, dtype=np.float64) - WINDOW_CENTER

    kernels = np.zeros((2 * AUDIO_DIM, WINDOW_LENGTH), dtype=np.float32)
    for k, (f, l) in enumerate(zip(freqs, lengths)):
        # Hann window of effective length l centered at 0
        win = 0.5 * (1 + np.cos(2 * np.pi * t / l))
        win[np.abs(t) > l / 2] = 0.0
        phase = 2 * np.pi * f * t / SR
        c = win * np.exp(1j * phase)
        c /= np.abs(c).sum()
        kernels[k] = c.real.astype(np.float32)
        kernels[k + AUDIO_DIM] = c.imag.astype(np.float32)
    return kernels


@partial(jax.jit, static_argnames=("n_frames",))
def _vqt_blocked(y: jnp.ndarray, kernels: jnp.ndarray, n_frames: int) -> jnp.ndarray:
    """y: (N,) mono audio -> (AUDIO_DIM, n_frames) magnitudes.

    out[n] = sum_m kernel[m] * y_pad[n*hop + m] with the analysis window
    centered on frame time n*hop. Computed as WINDOW_BLOCKS accumulated
    matmuls over hop-aligned signal blocks.
    """
    hop = HOP_LENGTH
    # frame n's window starts at n*hop - WINDOW_CENTER in signal coordinates;
    # left-pad by WINDOW_CENTER (a whole number of hops) to keep alignment
    total = (n_frames + WINDOW_BLOCKS - 1) * hop
    y = jnp.pad(y, (WINDOW_CENTER, max(0, total - y.shape[0] - WINDOW_CENTER)))[:total]
    blocks = y.reshape(-1, hop)  # (n_frames + 11, hop) — free reshape

    chunks = kernels.reshape(2 * AUDIO_DIM, WINDOW_BLOCKS, hop)
    out = jnp.zeros((n_frames, 2 * AUDIO_DIM), dtype=jnp.float32)
    for b in range(WINDOW_BLOCKS):
        out = out + jnp.dot(
            blocks[b : b + n_frames], chunks[:, b, :].T, preferred_element_type=jnp.float32
        )
    out = out.T  # (192, T)
    re, im = out[:AUDIO_DIM], out[AUDIO_DIM:]
    return jnp.sqrt(re * re + im * im)


def vqt(y: np.ndarray | jnp.ndarray, hop_length: int = HOP_LENGTH) -> jnp.ndarray:
    """Magnitude VQT, shape (AUDIO_DIM, 1 + len(y)//hop_length)."""
    assert hop_length == HOP_LENGTH, "kernel bank is built for the canonical 8 ms hop"
    y = jnp.asarray(y, dtype=jnp.float32)
    kernels = jnp.asarray(vqt_kernels())
    n_frames = 1 + y.shape[0] // hop_length
    return _vqt_blocked(y, kernels, n_frames)


def log_vqt(y: np.ndarray | jnp.ndarray, hop_length: int = HOP_LENGTH) -> jnp.ndarray:
    """log(|VQT| + 1e-10): the model's audio feature (silence floor -23.03)."""
    return jnp.log(vqt(y, hop_length) + 1e-10)

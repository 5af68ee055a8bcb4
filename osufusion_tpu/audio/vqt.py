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

Normalization matches librosa's ``vqt(..., norm=1, scale=True)`` convention:
kernels are L1-normalized then scaled by sqrt(filter_length), so a
unit-amplitude tone at bin k's center frequency yields a magnitude of
~sqrt(l_k)/2 — the per-bin scale reference-trained weights would have seen —
and silence maps to log(1e-10) = -23.03 exactly as the reference's padding
convention expects. tests/vqt_oracle.py holds a from-scratch numpy
reimplementation of librosa 0.10.1's recursive algorithm as the tolerance
oracle.

REFERENCE QUIRK (fixed here): librosa 0.10.1's vqt requires hop_length to be
divisible by 2^(n_octaves-1) = 128 for its recursive octave halving
(librosa/core/constantq.py, __num_two_factors check); the reference's
hop of 176 = 2^4 * 11 with 8 octaves therefore raises ParameterError on every
audio file under its own pinned librosa (reference requirements.txt:
librosa==0.10.1; call site osu_fusion/scripts/dataset_creator.py:44-53). The
single-resolution filterbank here has no such constraint: the canonical 8 ms
hop works directly. tests/test_audio.py pins both facts.
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

# The longest filter is Q*sr/(FMIN + GAMMA/ALPHA) ~ 1.56k samples. The
# analysis window is a whole number of hops so frames align with a free
# reshape of the signal into (n, hop) blocks; the kernel center sits on a hop
# boundary for the same reason. 12 blocks at the canonical 8 ms hop (2112).
MAX_FILTER_LENGTH = 2048


def _window_blocks(hop: int) -> int:
    """Even number of hop-sized blocks covering the longest filter."""
    return 2 * max(1, -(-MAX_FILTER_LENGTH // (2 * hop)))


WINDOW_BLOCKS = _window_blocks(HOP_LENGTH)  # 12
WINDOW_LENGTH = WINDOW_BLOCKS * HOP_LENGTH  # 2112
WINDOW_CENTER = (WINDOW_BLOCKS // 2) * HOP_LENGTH  # 1056


def bin_frequencies() -> np.ndarray:
    return FMIN * 2.0 ** (np.arange(AUDIO_DIM) / OCTAVE_BINS)


def filter_lengths() -> np.ndarray:
    freqs = bin_frequencies()
    return np.minimum(Q * SR / (freqs + GAMMA / ALPHA), MAX_FILTER_LENGTH)


@lru_cache(maxsize=4)
def vqt_kernels(hop: int = HOP_LENGTH) -> np.ndarray:
    """(2 * AUDIO_DIM, blocks*hop) float32 bank: real rows then imag rows.

    Each kernel is a Hann-windowed complex exponential of its own effective
    length, centered in the fixed window, L1-normalized then scaled by
    sqrt(length) — librosa's ``scale=True`` magnitude convention, verified
    against the oracle in tests/test_audio.py.
    """
    freqs = bin_frequencies()
    lengths = filter_lengths()
    blocks = _window_blocks(hop)
    window_length = blocks * hop
    center = (blocks // 2) * hop
    t = np.arange(window_length, dtype=np.float64) - center

    kernels = np.zeros((2 * AUDIO_DIM, window_length), dtype=np.float32)
    for k, (f, l) in enumerate(zip(freqs, lengths)):
        # Hann window of effective length l centered at 0
        win = 0.5 * (1 + np.cos(2 * np.pi * t / l))
        win[np.abs(t) > l / 2] = 0.0
        phase = 2 * np.pi * f * t / SR
        c = win * np.exp(1j * phase)
        c *= np.sqrt(l) / np.abs(c).sum()
        kernels[k] = c.real.astype(np.float32)
        kernels[k + AUDIO_DIM] = c.imag.astype(np.float32)
    return kernels


@partial(jax.jit, static_argnames=("n_frames", "hop"))
def _vqt_blocked(y: jnp.ndarray, kernels: jnp.ndarray, n_frames: int, hop: int) -> jnp.ndarray:
    """y: (N,) mono audio -> (AUDIO_DIM, n_frames) magnitudes.

    out[n] = sum_m kernel[m] * y_pad[n*hop + m] with the analysis window
    centered on frame time n*hop. Computed as window-block-count accumulated
    matmuls over hop-aligned signal blocks.
    """
    blocks_n = _window_blocks(hop)
    center = (blocks_n // 2) * hop
    # frame n's window starts at n*hop - center in signal coordinates;
    # left-pad by center (a whole number of hops) to keep alignment
    total = (n_frames + blocks_n - 1) * hop
    y = jnp.pad(y, (center, max(0, total - y.shape[0] - center)))[:total]
    blocks = y.reshape(-1, hop)  # (n_frames + blocks_n - 1, hop) — free reshape

    chunks = kernels.reshape(2 * AUDIO_DIM, blocks_n, hop)
    out = jnp.zeros((n_frames, 2 * AUDIO_DIM), dtype=jnp.float32)
    for b in range(blocks_n):
        out = out + jnp.dot(
            blocks[b : b + n_frames], chunks[:, b, :].T, preferred_element_type=jnp.float32
        )
    out = out.T  # (192, T)
    re, im = out[:AUDIO_DIM], out[AUDIO_DIM:]
    return jnp.sqrt(re * re + im * im)


def vqt(y: np.ndarray | jnp.ndarray, hop_length: int = HOP_LENGTH) -> jnp.ndarray:
    """Magnitude VQT, shape (AUDIO_DIM, 1 + len(y)//hop_length). Any hop
    works (librosa's recursive algorithm needs hop % 2^7 == 0; see module
    docstring) — the kernel bank is rebuilt per hop and cached."""
    y = jnp.asarray(y, dtype=jnp.float32)
    kernels = jnp.asarray(vqt_kernels(hop_length))
    n_frames = 1 + y.shape[0] // hop_length
    return _vqt_blocked(y, kernels, n_frames, hop_length)


def log_vqt(y: np.ndarray | jnp.ndarray, hop_length: int = HOP_LENGTH) -> jnp.ndarray:
    """log(|VQT| + 1e-10): the model's audio feature (silence floor -23.03)."""
    return jnp.log(vqt(y, hop_length) + 1e-10)

"""Numpy test oracle reimplementing librosa 0.10.1's ``vqt()`` algorithm.

librosa is not installable in this environment (no network), so this module
re-derives the reference's audio front end from librosa 0.10.1's published
algorithm (librosa/core/constantq.py: ``vqt``, ``__vqt_filter_fft``,
``__cqt_response``, ``__trim_stack``; librosa/filters.py: ``wavelet``,
``wavelet_lengths``) for the configuration the reference uses
(reference osu_fusion/scripts/dataset_creator.py:44-53: intervals='equal',
tuning=0, filter_scale=1, norm=1, window='hann', scale=True, gamma=None,
pad_mode='constant'). scipy's polyphase resampler stands in for soxr_hq in
the per-octave 2:1 decimation — a different anti-alias filter, absorbed by
the comparison tolerance.

It reproduces librosa's behaviors exactly where they are structural:
- per-bin filter lengths  l_k = Q*sr / (f_k + gamma/alpha)  with the
  Glasberg-Moore ERB default gamma = 24.7*alpha/0.108;
- L1-normalized Hann-windowed analytic wavelets, center-padded to a
  power-of-two n_fft, scaled by l_k/n_fft before the rFFT;
- octave-by-octave evaluation from the top: response = fft_basis @ rfft-STFT
  (rectangular window, centered frames), filters rebuilt at the halved rate,
  fft_basis scaled by sqrt(sr/my_sr), audio resampled 2:1 with energy
  scaling (amplitude * sqrt(2) per halving);
- final scale=True division by sqrt(l_k) at the original rate;
- THE HOP CONSTRAINT: hop_length must carry at least n_octaves-1 factors of
  two for the recursive halving — librosa raises ParameterError otherwise,
  which the reference's own constants (hop 176 = 2^4 * 11, 8 octaves) trip.
"""

from __future__ import annotations

import numpy as np
import scipy.signal


def _num_two_factors(x: int) -> int:
    if x <= 0:
        return 0
    n = 0
    while x % 2 == 0:
        n += 1
        x //= 2
    return n


def relative_bandwidth(bins_per_octave: int) -> float:
    r = 2.0 ** (1.0 / bins_per_octave)
    return (r**2 - 1) / (r**2 + 1)


def wavelet_lengths(
    freqs: np.ndarray, sr: float, gamma: float | None, alpha: float, filter_scale: float = 1.0
) -> np.ndarray:
    if gamma is None:
        gamma = 24.7 * alpha / 0.108  # Glasberg-Moore ERB default
    Q = filter_scale / alpha
    return Q * sr / (np.asarray(freqs, dtype=np.float64) + gamma / alpha)


def _wavelet_basis(freqs, sr, gamma, alpha):
    """L1-normalized Hann-windowed analytic wavelets, center-padded to the
    next power of two (librosa.filters.wavelet with pad_fft=True, norm=1)."""
    lengths = wavelet_lengths(freqs, sr, gamma, alpha)
    filts = []
    for ilen, freq in zip(lengths, freqs):
        t = np.arange(-ilen // 2, ilen // 2, dtype=np.float64)
        sig = np.exp(1j * 2 * np.pi * freq * t / sr)
        sig = sig * scipy.signal.get_window("hann", len(sig), fftbins=True)
        sig = sig / np.sum(np.abs(sig))
        filts.append(sig)
    max_len = max(len(f) for f in filts)
    n_fft = int(2.0 ** np.ceil(np.log2(max_len)))
    basis = np.zeros((len(filts), n_fft), dtype=np.complex128)
    for i, f in enumerate(filts):
        start = (n_fft - len(f)) // 2
        basis[i, start : start + len(f)] = f
    return basis, n_fft, lengths


def _vqt_filter_fft(sr, freqs, gamma, alpha, hop_length):
    basis, n_fft, lengths = _wavelet_basis(freqs, sr, gamma, alpha)
    if hop_length is not None and n_fft < 2.0 ** (1 + np.ceil(np.log2(hop_length))):
        bigger = int(2.0 ** (1 + np.ceil(np.log2(hop_length))))
        pad = np.zeros((basis.shape[0], bigger), dtype=basis.dtype)
        start = (bigger - n_fft) // 2
        pad[:, start : start + n_fft] = basis
        basis, n_fft = pad, bigger
    basis = basis * (lengths[:, None] / float(n_fft))
    fft_basis = np.fft.fft(basis, n=n_fft, axis=1)[:, : n_fft // 2 + 1]
    return fft_basis, n_fft


def _stft_ones(y, n_fft, hop_length):
    """Centered rectangular-window rFFT STFT (librosa.stft(window='ones'),
    pad_mode='constant')."""
    y = np.pad(y, n_fft // 2)
    n_frames = 1 + (len(y) - n_fft) // hop_length
    idx = np.arange(n_fft)[None, :] + hop_length * np.arange(n_frames)[:, None]
    return np.fft.rfft(y[idx], axis=1).T  # (n_fft//2+1, n_frames)


def _resample_halve(y: np.ndarray) -> np.ndarray:
    """2:1 decimation with energy scaling (librosa.resample(orig_sr=2,
    target_sr=1, scale=True): amplitude * sqrt(2))."""
    return scipy.signal.resample_poly(y, 1, 2) * np.sqrt(2.0)


def vqt_librosa_0_10_1(
    y: np.ndarray,
    sr: int = 22050,
    hop_length: int = 512,
    fmin: float = 32.703,
    n_bins: int = 84,
    bins_per_octave: int = 12,
    gamma: float | None = None,
) -> np.ndarray:
    """librosa-0.10.1-equivalent |VQT| (magnitudes), shape (n_bins, frames)."""
    n_octaves = int(np.ceil(float(n_bins) / bins_per_octave))
    n_filters = min(bins_per_octave, n_bins)
    freqs = fmin * 2.0 ** (np.arange(n_bins) / bins_per_octave)
    alpha = relative_bandwidth(bins_per_octave)

    # the recursive halving constraint the reference's constants violate
    if _num_two_factors(hop_length) < n_octaves - 1:
        raise ValueError(
            f"hop_length must be a positive integer multiple of 2^{n_octaves - 1} "
            f"for {n_octaves}-octave CQT/VQT"
        )

    resp = []
    my_y, my_sr, my_hop = np.asarray(y, dtype=np.float64), float(sr), hop_length
    for i in range(n_octaves):
        if i > 0:
            my_y = _resample_halve(my_y)
            my_sr /= 2.0
            my_hop //= 2
        sl = slice(-n_filters * (i + 1), -n_filters * i if i else None)
        fft_basis, n_fft = _vqt_filter_fft(my_sr, freqs[sl], gamma, alpha, my_hop)
        fft_basis = fft_basis * np.sqrt(sr / my_sr)  # downsampling compensation
        resp.append(fft_basis @ _stft_ones(my_y, n_fft, my_hop))

    # trim stack: bottom rows come from the last (deepest) octave
    max_col = min(r.shape[-1] for r in resp)
    out = np.empty((n_bins, max_col), dtype=np.complex128)
    end = n_bins
    for r in resp:
        n_oct = r.shape[0]
        if end < n_oct:
            out[:end] = r[-end:, :max_col]
        else:
            out[end - n_oct : end] = r[:, :max_col]
        end -= n_oct

    lengths = wavelet_lengths(freqs, sr, gamma, alpha)
    return np.abs(out) / np.sqrt(lengths[:, None])  # scale=True

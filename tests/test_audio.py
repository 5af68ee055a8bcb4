"""Audio front-end tests: VQT filterbank correctness and IO."""

import numpy as np
import pytest
from scipy.io import wavfile

from osufusion_tpu.audio import (
    AUDIO_DIM,
    HOP_LENGTH,
    SILENCE_VALUE,
    SR,
    frame_times,
    load_audio,
    log_vqt,
    normalize_context,
    unnormalize_context,
)
from osufusion_tpu.audio.vqt import bin_frequencies, filter_lengths, vqt


def test_constants():
    assert HOP_LENGTH == 176
    assert AUDIO_DIM == 96
    ft = frame_times(3)
    # 176 samples at 22050 Hz ~= 7.98 ms per frame
    assert ft[1] == pytest.approx(176 / 22050 * 1000)


def test_filter_lengths_bounded():
    lens = filter_lengths()
    assert lens.max() <= 2048
    assert lens.min() > 8
    # monotonically decreasing with frequency
    assert np.all(np.diff(lens) <= 0)


def test_vqt_tone_peaks_at_correct_bin():
    freqs = bin_frequencies()
    lengths = filter_lengths()
    t = np.arange(SR * 2) / SR
    for target_bin in [12, 48, 80]:
        tone = np.sin(2 * np.pi * freqs[target_bin] * t).astype(np.float32)
        spec = np.asarray(vqt(tone))
        # average response over interior frames
        avg = spec[:, 20:-20].mean(axis=1)
        assert int(np.argmax(avg)) == target_bin
        # unit tone at center frequency -> ~sqrt(l)/2 magnitude (librosa's
        # norm=1 + scale=True convention)
        assert avg[target_bin] == pytest.approx(np.sqrt(lengths[target_bin]) / 2, rel=0.15)


def test_reference_constants_raise_in_librosa():
    """Pins the REFERENCE QUIRK documented in audio/vqt.py: librosa 0.10.1
    (the reference's pinned version) cannot run the reference's own constants
    — hop 176 carries only 2^4 while the 8-octave recursion needs 2^7
    (reference osu_fusion/scripts/dataset_creator.py:17-24,:44-53 +
    requirements.txt). Our single-resolution filterbank has no such
    constraint (test_vqt_frame_count runs at hop 176)."""
    from tests.vqt_oracle import vqt_librosa_0_10_1

    y = np.zeros(SR, dtype=np.float32)
    with pytest.raises(ValueError, match=r"multiple of 2\^7"):
        vqt_librosa_0_10_1(y, sr=SR, hop_length=HOP_LENGTH, fmin=float(bin_frequencies()[0]), n_bins=AUDIO_DIM)


def test_vqt_matches_librosa_oracle():
    """Numeric tolerance vs the librosa-0.10.1 oracle (SURVEY section 4 test
    plan) at a librosa-LEGAL configuration: hop=128 (2^7 divides it), same
    fmin/bins/gamma. Tones at bin centers across all octaves must agree in
    peak bin and log-magnitude."""
    from tests.vqt_oracle import vqt_librosa_0_10_1

    hop = 128
    freqs = bin_frequencies()
    rng = np.random.default_rng(0)
    t = np.arange(SR * 2) / SR
    # multi-tone spanning low/mid/high octaves + a noise floor
    y = sum(0.3 * np.sin(2 * np.pi * freqs[b] * t + rng.uniform(0, 6)) for b in (6, 30, 54, 78, 90))
    y = (y + 0.001 * rng.standard_normal(len(t))).astype(np.float32)

    ours = np.log(np.asarray(vqt(y, hop_length=hop)) + 1e-10)
    theirs = np.log(vqt_librosa_0_10_1(y, sr=SR, hop_length=hop, fmin=float(freqs[0]), n_bins=AUDIO_DIM) + 1e-10)

    n = min(ours.shape[1], theirs.shape[1])
    interior = slice(40, n - 40)  # both transforms see edge effects
    ours_i, theirs_i = ours[:, interior], theirs[:, interior]

    diff = np.abs(ours_i - theirs_i)

    # (a) at the signal bins themselves: sub-1% magnitude agreement — the
    # normalization/scale conventions match librosa exactly
    for b in (6, 30, 54, 78, 90):
        assert diff[b].mean() < 0.01, f"bin {b} log error {diff[b].mean():.4f}"

    # (b) near-peak energy (within e^2 of each frame's max): tight agreement
    strong = theirs_i > theirs_i.max(axis=0, keepdims=True) - 2.0
    assert diff[strong].mean() < 0.03, f"near-peak mean log error {diff[strong].mean():.3f}"

    # (c) everything with real energy (above the -23 floor by a wide margin),
    # including leakage skirts where the oracle's polyphase resampler and our
    # single-rate filterbank legitimately differ at the few-% level
    active = theirs_i > -6.0
    assert active.mean() > 0.03, "oracle spectrogram unexpectedly empty"
    assert diff[active].mean() < 0.15, f"active-region mean log error {diff[active].mean():.3f}"
    assert np.quantile(diff[active], 0.95) < 0.6

    # per-frame peak bins agree
    assert (ours_i.argmax(axis=0) == theirs_i.argmax(axis=0)).mean() > 0.9


def test_log_vqt_silence_floor():
    silence = np.zeros(SR, dtype=np.float32)
    spec = np.asarray(log_vqt(silence))
    assert spec.shape == (AUDIO_DIM, 1 + SR // HOP_LENGTH)
    assert np.allclose(spec, SILENCE_VALUE, atol=1e-3)


def test_vqt_frame_count():
    n = SR * 3 + 123
    spec = np.asarray(vqt(np.random.default_rng(0).normal(0, 0.1, n).astype(np.float32)))
    assert spec.shape == (AUDIO_DIM, 1 + n // HOP_LENGTH)


def test_load_audio_wav_with_resample(tmp_path):
    # a 440 Hz (A4 = bin 57) tone written at 44.1 kHz must resample + transform
    sr_in = 44100
    t = np.arange(sr_in) / sr_in
    tone = (0.8 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    path = tmp_path / "tone.wav"
    wavfile.write(path, sr_in, (tone * 32767).astype(np.int16))

    spec = load_audio(path)
    assert spec.shape[0] == AUDIO_DIM
    avg = spec[:, 20:-20].mean(axis=1)
    peak_bin = int(np.argmax(avg))
    freqs = bin_frequencies()
    assert abs(freqs[peak_bin] - 440.0) / 440.0 < 0.03


def test_context_normalization_roundtrip():
    c = np.array([4.0, 9.5, 7.0, 5.0, 6.3], dtype=np.float32)
    n = normalize_context(c)
    assert n.min() >= -1 and n.max() <= 1
    # pure: input untouched
    assert c[0] == 4.0
    back = unnormalize_context(n)
    np.testing.assert_allclose(back, c, atol=1e-6)


def test_empty_audio_raises(tmp_path):
    path = tmp_path / "empty.wav"
    wavfile.write(path, SR, np.zeros(0, dtype=np.int16))
    with pytest.raises(ValueError, match="Empty audio"):
        load_audio(path)

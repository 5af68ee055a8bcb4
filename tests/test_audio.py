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
    t = np.arange(SR * 2) / SR
    for target_bin in [12, 48, 80]:
        tone = np.sin(2 * np.pi * freqs[target_bin] * t).astype(np.float32)
        spec = np.asarray(vqt(tone))
        # average response over interior frames
        avg = spec[:, 20:-20].mean(axis=1)
        assert int(np.argmax(avg)) == target_bin
        # unit tone at center frequency -> ~0.5 magnitude (L1 normalization)
        assert avg[target_bin] == pytest.approx(0.5, rel=0.15)


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

"""Audio decode + resample front end.

The reference shells out to FFmpeg and resamples with librosa/resampy
(reference osu_fusion/scripts/dataset_creator.py:36-55). Here: WAV decodes
natively via scipy; anything else goes through an ``ffmpeg`` subprocess when
the binary exists (gated — this build environment has none). Resampling is
polyphase (scipy ``resample_poly`` with a Kaiser window, the same filter
family as librosa's ``kaiser_best``).
"""

from __future__ import annotations

import shutil
import subprocess
from fractions import Fraction
from pathlib import Path

import numpy as np
from scipy.io import wavfile
from scipy.signal import resample_poly

from osufusion_tpu.audio.constants import SR
from osufusion_tpu.audio.vqt import log_vqt

_FFMPEG = shutil.which("ffmpeg")


def decode_wav(path: Path) -> tuple[int, np.ndarray]:
    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    if data.ndim == 2:
        data = data.mean(axis=1)
    return sr, data


def decode_ffmpeg(path: Path) -> tuple[int, np.ndarray]:
    if _FFMPEG is None:
        raise RuntimeError(
            f"cannot decode {path.suffix} audio: ffmpeg binary not available; provide WAV input"
        )
    proc = subprocess.run(
        [_FFMPEG, "-v", "quiet", "-i", str(path), "-f", "f32le", "-ac", "1", "-ar", str(SR), "-"],
        capture_output=True,
        check=True,
    )
    return SR, np.frombuffer(proc.stdout, dtype=np.float32).copy()


def load_waveform(path: Path, target_sr: int = SR) -> np.ndarray:
    """Decode any supported audio file to mono float32 at ``target_sr``."""
    path = Path(path)
    if path.suffix.lower() == ".wav":
        sr, wave = decode_wav(path)
    else:
        sr, wave = decode_ffmpeg(path)

    if wave.shape[0] == 0:
        raise ValueError(f"Empty audio file: {path}")

    if sr != target_sr:
        frac = Fraction(target_sr, sr).limit_denominator(1000)
        wave = resample_poly(wave, frac.numerator, frac.denominator, window=("kaiser", 12.0))
    return wave.astype(np.float32)


def load_audio(audio_file: Path) -> np.ndarray:
    """Audio file -> (AUDIO_DIM, T) log-VQT spectrogram (numpy float32).

    Same surface as the reference's ``load_audio`` (scripts/dataset_creator.py:36):
    decode, resample to 22050 Hz, 96-bin log-VQT at 8 ms hop.
    """
    wave = load_waveform(audio_file)
    return np.asarray(log_vqt(wave), dtype=np.float32)

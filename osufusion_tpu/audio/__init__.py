from osufusion_tpu.audio.constants import (
    AUDIO_DIM,
    CONTEXT_DIM,
    FMIN,
    HOP_LENGTH,
    MS_PER_FRAME,
    N_OCTAVES,
    OCTAVE_BINS,
    SILENCE_VALUE,
    SR,
    frame_times,
    normalize_context,
    unnormalize_context,
)
from osufusion_tpu.audio.io import load_audio
from osufusion_tpu.audio.vqt import log_vqt

__all__ = [
    "SR",
    "MS_PER_FRAME",
    "HOP_LENGTH",
    "FMIN",
    "N_OCTAVES",
    "OCTAVE_BINS",
    "AUDIO_DIM",
    "CONTEXT_DIM",
    "SILENCE_VALUE",
    "frame_times",
    "normalize_context",
    "unnormalize_context",
    "load_audio",
    "log_vqt",
]

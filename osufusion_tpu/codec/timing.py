"""Beat-phase / measure-phase sawtooth signals and their inverse.

Parity with reference osu_fusion/library/osu/data/timing.py (an orphan in the
reference, but part of the capability surface): channel 0 is the fractional
beat phase, channel 1 the fractional measure phase, each reset at every
uninherited timing point; the first timing point is extended backwards by
whole measures so phase is defined from t=0.
"""

from __future__ import annotations

from typing import List

import numpy as np

from osufusion_tpu.osu.beatmap import Beatmap
from osufusion_tpu.osu.hit_objects import TimingPoint


def timing_signal(beatmap: Beatmap, frame_times: np.ndarray) -> np.ndarray:
    signals = np.zeros((2, frame_times.shape[0]))
    for i, tp in enumerate(beatmap.uninherited_timing_points):
        start = tp.t
        if i == 0:
            measure_length = tp.beat_length * tp.meter
            start -= (start // measure_length + 1) * measure_length
        window = frame_times >= start
        beat_phase = (frame_times - start) / tp.beat_length
        measure_phase = beat_phase / tp.meter
        signals[0, window] = beat_phase[window] % 1
        signals[1, window] = measure_phase[window] % 1
    return signals


def decode_timing_signal(signal: np.ndarray, frame_times: np.ndarray) -> List[TimingPoint]:
    """Per-frame naive inverse (one TimingPoint per frame), matching the
    reference's decode surface."""
    timing_points = []
    for i in range(signal.shape[1]):
        beat_phase = signal[0, i]
        measure_phase = signal[1, i]
        t = frame_times[i]
        beat_length = 1 / beat_phase if beat_phase != 0 else 1
        meter = measure_phase if measure_phase != 0 else 1
        timing_points.append(TimingPoint(t, beat_length, None, meter, None))
    return timing_points

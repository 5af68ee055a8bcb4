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


def _unwrapped_steps(phase: np.ndarray) -> np.ndarray:
    """Per-gap phase increments with the sawtooth wrap (x -> x+1 when the
    phase drops by more than half a cycle) undone."""
    dp = np.diff(phase)
    return np.where(dp < -0.5, dp + 1.0, dp)


def decode_timing_signal(
    signal: np.ndarray,
    frame_times: np.ndarray,
    min_segment_frames: int = 8,
    tempo_tolerance: float = 0.04,
) -> List[TimingPoint]:
    """Recover piecewise-constant uninherited timing from the 2-channel
    sawtooth: segment the beat-phase slope at tempo changes, then estimate
    each segment's beat length (robust median of dt/dphase), meter (beat vs
    measure slope ratio) and offset (circular median of the implied
    phase-zero times). Returns one TimingPoint per tempo segment with ``t``
    at the first beat boundary inside the segment — a true inverse of
    ``timing_signal`` up to frame quantization, where the reference's orphan
    decode emitted one pseudo-point per frame (reference timing.py:25-34).
    """
    beat, measure = np.asarray(signal[0], np.float64), np.asarray(signal[1], np.float64)
    t = np.asarray(frame_times, np.float64)
    n = t.shape[0]
    if n < 2:
        return [TimingPoint(float(t[0]) if n else 0.0, 1000.0, None, 4, None)]

    dt = np.diff(t)
    db = _unwrapped_steps(beat)
    dm = _unwrapped_steps(measure)

    # per-gap instantaneous beat length; tempo boundaries where it moves by
    # more than `tempo_tolerance` relative to the running segment estimate
    with np.errstate(divide="ignore", invalid="ignore"):
        bl_inst = np.where(db > 1e-9, dt / np.maximum(db, 1e-9), np.inf)

    points: List[TimingPoint] = []
    seg_start = 0

    def emit(a: int, b: int) -> None:
        """Estimate one segment over frame gaps [a, b)."""
        if b - a < 2:
            return
        seg = slice(a, b)
        bls = bl_inst[seg]
        finite = bls[np.isfinite(bls)]
        if finite.size == 0:
            return
        beat_length = float(np.median(finite))
        # meter: ratio of beat slope to measure slope over the segment
        sb, sm = float(np.sum(db[seg])), float(np.sum(dm[seg]))
        meter = int(np.clip(round(sb / sm), 1, 16)) if sm > 1e-9 else 4
        # offset: each frame implies a phase-zero time t_i - p_i*beat_length;
        # take the circular median modulo the beat length
        idx = np.arange(a, b + 1)
        zeros = t[idx] - beat[idx] * beat_length
        ref = zeros[0]
        resid = (zeros - ref + beat_length / 2) % beat_length - beat_length / 2
        offset = ref + float(np.median(resid))
        # report the first beat boundary at/after the segment's first frame
        first = t[a] + ((offset - t[a]) % beat_length)
        points.append(TimingPoint(float(first), beat_length, None, meter, None))

    run_ref = bl_inst[0]
    for i in range(1, n - 1):
        cur = bl_inst[i]
        if np.isfinite(cur) and np.isfinite(run_ref):
            if abs(cur - run_ref) / run_ref > tempo_tolerance and i - seg_start >= min_segment_frames:
                # confirm the change persists (debounce single-frame noise)
                look = bl_inst[i : i + min_segment_frames]
                look = look[np.isfinite(look)]
                if look.size and np.all(np.abs(look - run_ref) / run_ref > tempo_tolerance):
                    emit(seg_start, i)
                    seg_start = i
                    run_ref = cur
                    continue
        # track slow drift of the estimate within a segment
        if np.isfinite(cur):
            run_ref = 0.9 * run_ref + 0.1 * cur if np.isfinite(run_ref) else cur
    emit(seg_start, n - 1)
    if not points:
        points.append(TimingPoint(float(t[0]), 1000.0, None, 4, None))
    return points

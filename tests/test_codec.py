"""Codec tests: signal encoders, exact flip/extent inverses, and the full
encode -> decode -> re-encode round trip on a synthetic beatmap."""

import numpy as np
import pytest

from osufusion_tpu.codec import TOTAL_DIM, BeatmapEncoding, encode_beatmap
from osufusion_tpu.codec.decode import Metadata, decode_beatmap
from osufusion_tpu.codec.fit_bezier import fit_bezier, get_segment_length
from osufusion_tpu.codec.hit import decode_extents, decode_flips, extents, flips_from_times
from osufusion_tpu.codec.timing import timing_signal
from osufusion_tpu.osu import Beatmap
from tests.helpers import write_synthetic_map

MS_PER_FRAME = 8


def frame_times_for(n: int) -> np.ndarray:
    return np.arange(n, dtype=float) * MS_PER_FRAME


def test_flips_roundtrip_exact():
    ft = frame_times_for(1024)
    onsets = np.array([80.0, 400.0, 1000.0, 2000.0, 5000.0])
    sig = flips_from_times(onsets, ft)
    assert set(np.unique(sig)) <= {0.0, 1.0}
    decoded = decode_flips(sig)
    expect = [int(np.searchsorted(ft, t)) for t in onsets]
    # the gradient-peak decoder sits on a two-sample plateau: within 1 frame
    assert len(decoded) == len(expect)
    assert all(abs(d - e) <= 1 for d, e in zip(decoded, expect))


def test_extents_roundtrip_exact():
    ft = frame_times_for(1024)
    regions = [(100.0, 400.0), (1000.0, 1600.0), (4000.0, 6000.0)]
    sig = extents(regions, ft)
    starts, ends = decode_extents(sig)
    # decode_extents finds the transition just before each region
    assert len(starts) == len(regions)
    for (s, e), ds, de in zip(regions, starts, ends):
        assert abs(ft[ds] - s) <= 2 * MS_PER_FRAME
        assert abs(ft[de] - e) <= 2 * MS_PER_FRAME


def test_extents_orphan_end_cleanup():
    # an end with no preceding start must be dropped
    sig = np.zeros(100)
    sig[:10] = 1.0  # starts already-high: produces an end at ~10 with no start
    sig[50:60] = 1.0
    starts, ends = decode_extents(sig)
    assert all(s < e for s, e in zip(starts, ends))


def test_encode_shapes_and_range(tmp_path):
    bm = Beatmap(write_synthetic_map(tmp_path))
    ft = frame_times_for(2048)
    x = encode_beatmap(bm, ft)
    assert x.shape == (TOTAL_DIM, 2048)
    assert x.min() >= -1.0 - 1e-9 and x.max() <= 1.0 + 1e-9
    # hit channels are exactly binary in {-1, 1}
    for ch in (BeatmapEncoding.HIT, BeatmapEncoding.SUSTAIN, BeatmapEncoding.SLIDER, BeatmapEncoding.COMBO):
        assert set(np.unique(x[ch])) <= {-1.0, 1.0}
    # HIT flips once per hit object
    n_flips = int(np.abs(np.diff((x[BeatmapEncoding.HIT] + 1) / 2)).sum())
    assert n_flips == len(bm.hit_objects)


def test_cursor_channels_track_objects(tmp_path):
    bm = Beatmap(write_synthetic_map(tmp_path))
    ft = frame_times_for(2048)
    x = encode_beatmap(bm, ft)
    cx = (x[BeatmapEncoding.CURSOR_X] + 1) / 2 * 512
    cy = (x[BeatmapEncoding.CURSOR_Y] + 1) / 2 * 384
    # before first object at t=1000: parked at (100, 100)
    assert cx[0] == pytest.approx(100, abs=1)
    assert cy[0] == pytest.approx(100, abs=1)
    # during spinner (6000-7000ms): center
    idx = int(np.searchsorted(ft, 6500))
    assert cx[idx] == pytest.approx(256, abs=1)
    assert cy[idx] == pytest.approx(192, abs=1)


def test_timing_signal_sawtooth(tmp_path):
    bm = Beatmap(write_synthetic_map(tmp_path))
    ft = frame_times_for(2048)
    ts = timing_signal(bm, ft)
    assert ts.shape == (2, 2048)
    assert ts.min() >= 0.0 and ts.max() < 1.0
    # beat phase resets every beat_length=500ms after offset 1000
    i0 = int(np.searchsorted(ft, 1000.0))
    assert ts[0, i0] == pytest.approx((ft[i0] - 1000.0) % 500 / 500, abs=1e-9)


def test_timing_signal_round_trip():
    """decode_timing_signal recovers piecewise-constant tempo: BPM, meter and
    beat-boundary alignment for a two-tempo synthetic signal."""
    from osufusion_tpu.codec.timing import decode_timing_signal
    from osufusion_tpu.osu.hit_objects import TimingPoint

    ft = frame_times_for(4096)  # 8 ms frames
    tps = [TimingPoint(500.0, 400.0, None, 4, None), TimingPoint(15000.0, 320.0, None, 3, None)]

    class _FakeMap:
        uninherited_timing_points = tps

    ts = timing_signal(_FakeMap(), ft)
    decoded = decode_timing_signal(ts, ft)
    assert len(decoded) == 2, [d.beat_length for d in decoded]
    for want, got in zip(tps, decoded):
        assert got.beat_length == pytest.approx(want.beat_length, rel=0.01)
        assert got.meter == want.meter
        # decoded t sits on a beat boundary of the true grid
        resid = (got.t - want.t) % want.beat_length
        assert min(resid, want.beat_length - resid) < 10.0  # within ~1 frame


def test_fit_bezier_error_bound():
    rng = np.random.default_rng(0)
    t = np.linspace(0, 1, 60)
    curve = np.stack([300 * t, 100 * np.sin(np.pi * t)], axis=1) + rng.normal(0, 0.3, (60, 2))
    segments = fit_bezier(curve, max_err=50.0)
    assert len(segments) >= 1
    total = sum(get_segment_length(s) for s in segments)
    chord = np.linalg.norm(curve[-1] - curve[0])
    assert total >= chord * 0.95
    # endpoints preserved
    assert np.allclose(segments[0][0], curve[0], atol=2)
    assert np.allclose(segments[-1][-1], curve[-1], atol=2)


def test_decode_drops_onsets_inside_previous_span(tmp_path):
    """An onset inside a spinner's span (what a noisy/untrained model emits)
    must be dropped so the decoded file always re-parses — the reference
    emitted it and its own parser then rejected the file."""
    from osufusion_tpu.codec.hit import extents, flips_from_times

    ft = frame_times_for(400)
    x = np.full((TOTAL_DIM, 400), -1.0)
    # onsets at frames 50 (spinner, sustain [50, 150)), 100 (inside), 200 (after)
    x[BeatmapEncoding.HIT] = flips_from_times(ft[[50, 100, 200]], ft) * 2 - 1
    x[BeatmapEncoding.SUSTAIN] = extents([(ft[50], ft[150])], ft) * 2 - 1
    x[BeatmapEncoding.CURSOR_X :] = 0.0  # centred cursor

    meta = Metadata("audio.mp3", "Overlap", "UnitTest", "OV", 4, 8, 6, 5)
    osu_text = decode_beatmap(meta, x, ft, bpm=120.0, allow_beat_snap=False, verbose=False)
    out = tmp_path / "overlap.osu"
    out.write_text(osu_text, encoding="utf-8")
    bm = Beatmap(out)  # must not raise "not in chronological order"
    assert len(bm.hit_objects) == 2  # spinner + trailing circle; inner onset dropped


def test_decode_clamps_slider_velocity(tmp_path):
    """A slider whose cursor trace demands SV > 10 must be written at the
    clamped velocity with its effective end time respected — the reference
    wrote the raw out-of-range SV, so a parser's clamp stretched the slider
    over later objects and the file failed to re-parse."""
    from osufusion_tpu.codec.hit import extents, flips_from_times
    from osufusion_tpu.osu.hit_objects import Slider

    ft = frame_times_for(400)
    x = np.full((TOTAL_DIM, 400), -1.0)
    # slider at frame 50 sweeping the playfield in 64 ms (needs SV ~17);
    # onset at frame 60 lands inside its clamped effective span; frame 300 after
    x[BeatmapEncoding.HIT] = flips_from_times(ft[[50, 60, 300]], ft) * 2 - 1
    x[BeatmapEncoding.SUSTAIN] = extents([(ft[50], ft[58])], ft) * 2 - 1
    x[BeatmapEncoding.SLIDER] = extents([(ft[50], ft[58])], ft) * 2 - 1
    cx = np.full(400, -1.0)
    cx[50:59] = np.linspace(-1, 1, 9)
    cx[59:] = 1.0
    x[BeatmapEncoding.CURSOR_X] = cx
    x[BeatmapEncoding.CURSOR_Y] = 0.0

    meta = Metadata("audio.mp3", "Clamp", "UnitTest", "CL", 4, 8, 6, 5)
    osu_text = decode_beatmap(meta, x, ft, allow_beat_snap=False, verbose=False)
    out = tmp_path / "clamp.osu"
    out.write_text(osu_text, encoding="utf-8")
    bm = Beatmap(out)  # must re-parse despite the over-speed slider
    sliders = [ho for ho in bm.hit_objects if isinstance(ho, Slider)]
    assert len(sliders) == 1
    # parsed objects never overlap: each starts at/after the previous end
    for prev, cur in zip(bm.hit_objects, bm.hit_objects[1:]):
        assert cur.t >= prev.end_time() - 1e-3


def test_slider_end_time_mirrors_parser_exactly(tmp_path):
    """SliderIR.end_t must equal the parsed Slider.end_time() bit-for-bit for
    arbitrary sv/length/tempo — the decoder mirrors the parser's float
    expression, so abutting onsets (t == end) are neither dropped by the
    decoder nor rejected by the parser."""
    from osufusion_tpu.codec.decode import SliderIR, TempoGrid, _render_osu
    from osufusion_tpu.osu.hit_objects import Slider

    rng = np.random.default_rng(7)
    meta = Metadata("audio.mp3", "Mirror", "UnitTest", "MR", 4, 8, 6, 5)
    for trial in range(50):
        grid = TempoGrid(beat_length=float(rng.uniform(200.0, 700.0)), offset=0.0, snap=False)
        sv = float(min(10.0, max(0.1, round(float(rng.uniform(0.05, 12.0)), 3))))
        length = float(np.hypot(*rng.uniform(30, 300, size=2)))
        slides = int(rng.integers(1, 4))
        t = int(rng.integers(1000, 5000))
        slide_duration = length / ((1.0 * sv) * 100) * grid.beat_length
        end_t = int(t + slide_duration * slides)
        ir = SliderIR(t, end_t, ((10, 20), (200, 150)), length, slides, False, sv, False)
        osu_text = _render_osu(
            meta, [grid.header_line(), ir.velocity_line(grid, False)], [ir.object_line()]
        )
        path = tmp_path / f"mirror{trial}.osu"
        path.write_text(osu_text, encoding="utf-8")
        bm = Beatmap(path)
        (slider,) = [ho for ho in bm.hit_objects if isinstance(ho, Slider)]
        assert slider.end_time() == ir.end_t, (trial, sv, length, grid.beat_length)


def test_decode_noise_always_reparses(tmp_path):
    """THE decoder robustness invariant: decode_beatmap output re-parses for
    ARBITRARY model output — smooth noise drives every classification branch
    (circles, spinners, sliders with wild velocities, overlapping onsets).
    The reference crashes its own parser on such inputs (out-of-range SV,
    objects inside spans); we guarantee a well-formed file."""
    rng = np.random.default_rng(123)
    meta = Metadata("audio.mp3", "Fuzz", "UnitTest", "FZ", 4, 8, 6, 5)
    for trial, (n, bpm, snap) in enumerate(
        [(700, None, False), (900, 180.0, True), (1100, None, True), (800, 240.0, False)]
    ):
        ft = frame_times_for(n)
        raw = rng.standard_normal((TOTAL_DIM, n + 64))
        # smooth so threshold crossings form plausible span structure
        kernel = np.ones(9) / 9.0
        x = np.stack([np.convolve(ch, kernel, mode="same") for ch in raw])[:, :n]
        x = np.tanh(2.0 * x)
        # correlate SLIDER with SUSTAIN and smooth the cursor so the slider
        # classification branch (incl. extreme-velocity clamping) is hit too
        x[BeatmapEncoding.SLIDER] = np.where(
            x[BeatmapEncoding.SUSTAIN] > 0, np.abs(x[BeatmapEncoding.SLIDER]), x[BeatmapEncoding.SLIDER]
        )
        wide = np.ones(31) / 31.0
        for ch in (BeatmapEncoding.CURSOR_X, BeatmapEncoding.CURSOR_Y):
            x[ch] = np.convolve(np.convolve(x[ch], wide, mode="same"), wide, mode="same") * 12.0
        x = np.clip(x, -1.0, 1.0)
        osu_text = decode_beatmap(meta, x, ft, bpm=bpm, allow_beat_snap=snap, verbose=False)
        out = tmp_path / f"fuzz{trial}.osu"
        out.write_text(osu_text, encoding="utf-8")
        bm = Beatmap(out)  # must never raise
        assert len(bm.hit_objects) >= 1
        for prev, cur in zip(bm.hit_objects, bm.hit_objects[1:]):
            assert cur.t >= prev.end_time()


def test_full_roundtrip(tmp_path):
    """encode -> decode to .osu text -> reparse -> re-encode: onset structure
    must survive (the canonical ground-truth test, SURVEY.md section 4)."""
    bm = Beatmap(write_synthetic_map(tmp_path))
    ft = frame_times_for(2048)
    x = encode_beatmap(bm, ft)

    meta = Metadata("audio.mp3", "Synthetic Test", "UnitTest", "RT", 4, 8, 6, 5)
    osu_text = decode_beatmap(meta, x, ft, bpm=120.0, allow_beat_snap=False, verbose=False)

    out = tmp_path / "decoded.osu"
    out.write_text(osu_text, encoding="utf-8")
    bm2 = Beatmap(out)

    # same number of onsets within 1 (boundary effects allowed)
    assert abs(len(bm2.hit_objects) - len(bm.hit_objects)) <= 1

    # onset times within 2 frames
    t1 = np.array([ho.t for ho in bm.hit_objects])
    t2 = np.array([ho.t for ho in bm2.hit_objects])
    n = min(len(t1), len(t2))
    assert np.all(np.abs(t1[:n] - t2[:n]) <= 2 * MS_PER_FRAME + 1)

    # re-encoded HIT channel closely matches
    x2 = encode_beatmap(bm2, ft)
    hit1 = (x[BeatmapEncoding.HIT] + 1) / 2
    hit2 = (x2[BeatmapEncoding.HIT] + 1) / 2
    agreement = (hit1 == hit2).mean()
    assert agreement > 0.95

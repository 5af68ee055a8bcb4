"""Unit tests for the osu! domain layer: parser, sliders, bezier math."""

import numpy as np
import pytest

from osufusion_tpu.osu import Beatmap, Circle, Slider, Spinner, from_control_points
from osufusion_tpu.osu import bezier_math
from osufusion_tpu.osu.sliders import Bezier, Line, Perfect
from tests.helpers import write_synthetic_map


def test_parse_synthetic_beatmap(tmp_path):
    bm = Beatmap(write_synthetic_map(tmp_path))
    assert bm.mode == 0
    assert bm.title == "Synthetic Test"
    assert bm.artist == "UnitTest"
    assert bm.mapset_id == 12345
    assert bm.cs == 4 and bm.ar == 8 and bm.od == 6 and bm.hp == 5
    assert bm.slider_multiplier == 1.4

    assert len(bm.hit_objects) == 8
    kinds = [type(ho) for ho in bm.hit_objects]
    assert kinds[0] is Circle and kinds[1] is Circle
    assert isinstance(bm.hit_objects[2], Slider)
    assert isinstance(bm.hit_objects[3], Slider)
    assert isinstance(bm.hit_objects[4], Spinner)
    assert isinstance(bm.hit_objects[7], Circle)

    # uninherited + inherited timing points parsed
    assert len(bm.uninherited_timing_points) >= 1
    assert bm.uninherited_timing_points[0].beat_length == 500
    # inherited point at 9000 sets SV=2.0
    tp = bm.get_active_timing_point(9500)
    assert tp.slider_multiplier == pytest.approx(2.0)

    # chronological order enforced
    times = [ho.t for ho in bm.hit_objects]
    assert times == sorted(times)


def test_meta_only_defers_parsing(tmp_path):
    bm = Beatmap(write_synthetic_map(tmp_path), meta_only=True)
    assert bm.hit_objects == []
    bm.parse_map_data()
    assert len(bm.hit_objects) == 8


def test_slider_factory_types():
    mk = lambda pts: from_control_points(0, 500, 1.0, False, 1, 100, pts)
    assert isinstance(mk([np.array([0, 0]), np.array([100, 0])]), Line)
    assert isinstance(mk([np.array([0, 0]), np.array([50, 50]), np.array([100, 0])]), Perfect)
    # collinear forward -> Line
    assert isinstance(mk([np.array([0, 0]), np.array([50, 0]), np.array([100, 0])]), Line)
    # collinear folded back (p3 behind p1) -> Bezier out-and-back
    assert isinstance(mk([np.array([50, 0]), np.array([100, 0]), np.array([0, 0])]), Bezier)
    # 4+ points -> Bezier
    assert isinstance(
        mk([np.array([0, 0]), np.array([10, 50]), np.array([60, 50]), np.array([100, 0])]), Bezier
    )


def test_line_slider_geometry():
    s = from_control_points(0, 500, 1.0, False, 2, 100, [np.array([0, 0]), np.array([50, 0])])
    # declared length 100 extends the 50px segment
    assert np.allclose(s.lerp(1.0), [100, 0])
    assert np.allclose(s.lerp(0.0), [0, 0])
    assert np.allclose(s.lerp(0.5), [50, 0])
    # slide_duration = 100 / (1.0*100) * 500 = 500ms per slide; 2 slides
    assert s.slide_duration == pytest.approx(500)
    assert s.end_time() == pytest.approx(1000)
    # even slides end at the start
    assert np.allclose(s.end_pos(), [0, 0])


def test_perfect_slider_arc_length():
    # quarter circle of radius 100 centered near origin
    pts = [np.array([100, 0]), np.array([71, 71]), np.array([0, 100])]
    length = np.pi / 2 * 100
    s = from_control_points(0, 500, 1.0, False, 1, length, pts)
    assert isinstance(s, Perfect)
    assert np.allclose(s.lerp(0.0), [100, 0], atol=2)
    end = s.lerp(1.0)
    assert np.linalg.norm(end - np.array([0, 100])) < 5


def test_bezier_slider_segments_and_tail():
    # duplicated point forces a segment break; declared length beyond geometry
    # extends along the final tangent
    pts = [np.array([0.0, 0.0]), np.array([50.0, 0.0]), np.array([50.0, 0.0]), np.array([50.0, 30.0])]
    s = from_control_points(0, 500, 1.0, False, 1, 100, pts)
    assert isinstance(s, Bezier)
    assert len(s.path_segments) == 3  # two real segments + tail extension
    assert np.allclose(s.lerp(0.0), [0, 0])
    end = s.lerp(1.0)
    # 50px across + 30px up + 20px tail continues upward
    assert np.allclose(end, [50, 50], atol=1)


def test_bezier_math_matches_analytic():
    # quadratic bezier (0,0)-(1,0)-(1,1): B(t) = (2t-t^2, t^2)
    nodes = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]])
    for t in [0.0, 0.25, 0.5, 0.75, 1.0]:
        expect = np.array([2 * t - t * t, t * t])
        assert np.allclose(bezier_math.evaluate(nodes, t), expect)
    # derivative B'(t) = (2-2t, 2t)
    assert np.allclose(bezier_math.evaluate_hodograph(nodes, 0.5), [1.0, 1.0])
    # straight-line length exact
    line = np.array([[0.0, 0.0], [3.0, 4.0]])
    assert bezier_math.curve_length(line) == pytest.approx(5.0)
    # curve length close to dense polyline estimate
    ts = np.linspace(0, 1, 20001)
    poly = np.linalg.norm(np.diff(bezier_math.evaluate(nodes, ts), axis=0), axis=1).sum()
    assert bezier_math.curve_length(nodes) == pytest.approx(poly, rel=1e-6)


def test_cursor_zero_length_slider(tmp_path):
    """A zero-pixel-length slider (slide_duration == 0) parses on real corpora;
    the cursor model must pin the cursor to its head instead of dividing by
    the zero duration."""
    osu = (
        "osu file format v14\n\n[General]\nAudioFilename: audio.mp3\nMode: 0\n\n"
        "[Metadata]\nTitle: Zero\nArtist: T\nCreator: t\nVersion: Z\n\n"
        "[Difficulty]\nHPDrainRate: 5\nCircleSize: 4\nOverallDifficulty: 6\n"
        "ApproachRate: 8\nSliderMultiplier: 1.4\nSliderTickRate: 1\n\n"
        "[TimingPoints]\n1000,500,4,1,0,50,1,0\n\n"
        "[HitObjects]\n"
        "100,100,1000,2,0,L|100:100,1,0\n"
        "200,200,2000,1,0,0:0:0:0:\n"
        "50,60,3000,2,0,B|50:60|50:60|50:60,1,0\n"
        "300,300,4000,1,0,0:0:0:0:\n"
    )
    p = tmp_path / "zero.osu"
    p.write_text(osu, encoding="utf-8")
    bm = Beatmap(p)
    for t in (500, 1000, 1500, 2500, 3000, 3500, 4000):
        (x, y), _ = bm.cursor(t)
        assert abs(x) <= 512 and abs(y) <= 512, (t, x, y)
    assert tuple(bm.cursor(1000)[0]) == (100, 100)
    assert tuple(bm.cursor(3000)[0]) == (50, 60)


def test_cursor_ground_truth(tmp_path):
    bm = Beatmap(write_synthetic_map(tmp_path))
    # before the first object: parked at its position
    (x, y), _ = bm.cursor(0)
    assert (x, y) == (100, 100)
    # during the spinner: center
    (x, y), _ = bm.cursor(6500)
    assert (x, y) == (256, 192)

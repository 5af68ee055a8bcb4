from osufusion_tpu.osu.beatmap import Beatmap
from osufusion_tpu.osu.hit_objects import Circle, HitObject, Slider, Spinner, Timed, TimingPoint
from osufusion_tpu.osu.sliders import Bezier, Line, Perfect, from_control_points

__all__ = [
    "Beatmap",
    "Circle",
    "HitObject",
    "Slider",
    "Spinner",
    "Timed",
    "TimingPoint",
    "Line",
    "Perfect",
    "Bezier",
    "from_control_points",
]

"""Shared test fixtures: synthetic beatmaps written as real .osu v14 text."""

from __future__ import annotations

from pathlib import Path

SYNTHETIC_OSU = """osu file format v14

[General]
AudioFilename: audio.mp3
AudioLeadIn: 0
Mode: 0

[Metadata]
Title: Synthetic Test
Artist: UnitTest
Creator: osufusion-tpu
Version: Easy
BeatmapSetID: 12345

[Difficulty]
HPDrainRate: 5
CircleSize: 4
OverallDifficulty: 6
ApproachRate: 8
SliderMultiplier: 1.4
SliderTickRate: 1

[TimingPoints]
1000,500,4,1,0,50,1,0
9000,-50,4,1,0,50,0,0

[Events]
//Background and Video events

[HitObjects]
100,100,1000,5,0,0:0:0:0:
200,150,1500,1,0,0:0:0:0:
300,200,2000,2,0,L|400:200,1,100
150,250,3500,6,0,B|200:300|250:250|250:250|300:300,2,200
256,192,6000,12,0,7000
400,100,7500,1,0,0:0:0:0:
100,300,8000,2,0,P|200:350|300:300,1,200
350,80,10000,5,0,0:0:0:0:
"""


def write_synthetic_map(tmp_path: Path) -> Path:
    p = tmp_path / "mapset" / "synthetic.osu"
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(SYNTHETIC_OSU, encoding="utf-8")
    return p

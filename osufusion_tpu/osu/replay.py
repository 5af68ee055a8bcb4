"""Binary ``.osr`` replay decoder.

Capability parity with reference osu_fusion/library/osu/replay.py (an orphan
there, part of the capability surface): LEB128-prefixed strings (:46-57),
little-endian struct fields, LZMA-compressed event stream (:106-112), lifebar
parsing, numpy conversion and interpolated ``cursor(t)`` lookup (:166-190).
"""

from __future__ import annotations

import datetime
import lzma
import struct
from dataclasses import dataclass
from enum import IntEnum
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np


class GameMode(IntEnum):
    STANDARD = 0
    TAIKO = 1
    CATCH = 2
    MANIA = 3


class Key(IntEnum):
    M1 = 1 << 0
    M2 = 1 << 1
    K1 = 1 << 2
    K2 = 1 << 3
    SMOKE = 1 << 4


@dataclass
class ReplayEventOsu:
    time_delta: int
    x: float
    y: float
    keys: int


@dataclass
class LifeBarState:
    time: int
    life: float


class _Unpacker:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.offset = 0

    def string_length(self) -> int:
        # ULEB128
        out = 0
        shift = 0
        while True:
            b = self.data[self.offset]
            self.offset += 1
            out |= (b & 0x7F) << shift
            if not (b & 0x80):
                break
            shift += 7
        return out

    def unpack_string(self) -> Optional[str]:
        marker = self.data[self.offset]
        if marker not in (0x0, 0x0B):
            raise ValueError("Invalid string type")
        self.offset += 1
        if marker == 0x0:
            return None
        length = self.string_length()
        out = self.data[self.offset : self.offset + length].decode("utf-8")
        self.offset += length
        return out

    def unpack_once(self, fmt: str):
        specifier = f"<{fmt}"
        unpacked = struct.unpack_from(specifier, self.data, self.offset)
        self.offset += struct.calcsize(specifier)
        return unpacked[0]

    def unpack_timestamp(self) -> datetime.datetime:
        ticks = self.unpack_once("q")
        # .NET ticks: 100 ns since 0001-01-01
        ts = datetime.datetime.min + datetime.timedelta(microseconds=ticks / 10)
        return ts.replace(tzinfo=datetime.timezone.utc)

    @staticmethod
    def parse_replay_data(replay_data_str: str) -> Tuple[Optional[int], List[ReplayEventOsu]]:
        replay_data_str = replay_data_str.rstrip(",")
        events = [event.split("|") for event in replay_data_str.split(",")]

        rng_seed = None
        play_data = []
        for i, event in enumerate(events):
            time_delta = int(event[0])
            x = float(event[1])
            y = float(event[2])
            keys = int(event[3])
            # modern clients append an RNG-seed pseudo-event at the end
            if time_delta == -12345 and i == len(events) - 1:
                rng_seed = keys
                continue
            play_data.append(ReplayEventOsu(time_delta, x, y, keys))
        return rng_seed, play_data

    def unpack_replay_data(self) -> Tuple[Optional[int], List[ReplayEventOsu]]:
        length = self.unpack_once("i")
        data = self.data[self.offset : self.offset + length]
        data = lzma.decompress(data, format=lzma.FORMAT_AUTO)
        self.offset += length
        return self.parse_replay_data(data.decode("ascii"))

    def unpack_replay_id(self) -> int:
        try:
            return self.unpack_once("q")
        except struct.error:
            return self.unpack_once("l")

    def unpack_life_bar(self) -> Optional[List[LifeBarState]]:
        lifebar = self.unpack_string()
        if lifebar is None or lifebar == "":
            return None
        lifebar = lifebar.rstrip(",")
        states = [state.split("|") for state in lifebar.split(",")]
        return [LifeBarState(int(float(s[0])), float(s[1])) for s in states]


class Replay:
    """Parsed .osr replay with the interpolated cursor surface."""

    def __init__(self, replay_path: str, to_np: bool = True) -> None:
        u = _Unpacker(Path(replay_path).read_bytes())

        self.mode = GameMode(u.unpack_once("b"))
        if self.mode != GameMode.STANDARD:
            raise ValueError("Invalid game mode")

        self.game_version = u.unpack_once("i")
        self.beatmap_hash = u.unpack_string()
        self.username = u.unpack_string()
        self.replay_hash = u.unpack_string()
        self.count_300 = u.unpack_once("h")
        self.count_100 = u.unpack_once("h")
        self.count_50 = u.unpack_once("h")
        self.count_geki = u.unpack_once("h")
        self.count_katu = u.unpack_once("h")
        self.count_miss = u.unpack_once("h")
        self.score = u.unpack_once("i")
        self.max_combo = u.unpack_once("h")
        self.perfect = u.unpack_once("?")
        self.mods = u.unpack_once("i")
        self.life_bar = u.unpack_life_bar()
        self.timestamp = u.unpack_timestamp()
        self.rng_seed, self._replay_data = u.unpack_replay_data()
        self.replay_id = u.unpack_replay_id()

        self.to_np = to_np
        if to_np:
            self.replay_data_to_np()

    def replay_data_to_np(self) -> None:
        t = 0
        arr = np.zeros((len(self._replay_data), 3), dtype=np.float32)
        for i, event in enumerate(self._replay_data):
            t += event.time_delta
            arr[i] = [float(t), event.x, event.y]
        self._replay_data = arr[arr[:, 0].argsort()]

    @property
    def events(self) -> np.ndarray:
        return self._replay_data

    def cursor(self, t: float) -> Tuple[Tuple[float, float], float]:
        """Interpolated cursor position at absolute time t (ms), plus time
        until the next event."""
        assert self.to_np, "Replay data is not in numpy format"
        idx = int(np.searchsorted(self._replay_data[:, 0], t, side="right")) - 1
        if idx < 0:
            raise ValueError(f"Replay data does not contain any events before {t}")
        if idx == len(self._replay_data) - 1:
            return (float(self._replay_data[idx, 1]), float(self._replay_data[idx, 2])), 0.0

        t0, x0, y0 = self._replay_data[idx]
        t1, x1, y1 = self._replay_data[idx + 1]
        alpha = (t - t0) / (t1 - t0)
        return (float(x0 + alpha * (x1 - x0)), float(y0 + alpha * (y1 - y0))), float(t1 - t)

"""Binary ``.osr`` replay decoder.

Capability parity with reference osu_fusion/library/osu/replay.py (an orphan
there, part of the capability surface). The .osr format itself dictates the
field sequence — see https://osu.ppy.sh/wiki/en/Client/File_formats/osr_(file_format):
a mode byte, client version, three ULEB128-prefixed strings, judgement
counts, score/combo/mods, the lifebar graph, a .NET-ticks timestamp, an
LZMA-compressed ``delta|x|y|keys`` event stream, and the online replay id.

Design (original to this repo): the header is parsed from a declarative
field table driven by a small cursor-based ``_Reader``; the event stream is
decoded into a single (N, 4) numpy array with ``np.cumsum`` over the time
deltas, and ``cursor(t)`` interpolates with ``np.interp``.
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


@dataclass(frozen=True)
class LifeBarState:
    time: int
    life: float


# sentinel time-delta of the trailing RNG-seed pseudo-event (modern clients)
_RNG_SEED_MARKER = -12345

# .NET epoch (0001-01-01) in ticks of 100 ns
_TICKS_PER_US = 10


class _Reader:
    """Cursor over a bytes buffer with the three .osr primitive readers."""

    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes) -> None:
        self.buf = buf
        self.pos = 0

    def scalar(self, fmt: str):
        (value,) = struct.unpack_from("<" + fmt, self.buf, self.pos)
        self.pos += struct.calcsize("<" + fmt)
        return value

    def take(self, n: int) -> bytes:
        chunk = self.buf[self.pos : self.pos + n]
        self.pos += n
        return chunk

    def uleb128(self) -> int:
        value, shift = 0, 0
        while True:
            byte = self.buf[self.pos]
            self.pos += 1
            value |= (byte & 0x7F) << shift
            if byte < 0x80:
                return value
            shift += 7

    def string(self) -> Optional[str]:
        marker = self.scalar("B")
        if marker == 0x00:
            return None
        if marker != 0x0B:
            raise ValueError(f"Invalid string type 0x{marker:02x}")
        return self.take(self.uleb128()).decode("utf-8")


def _parse_lifebar(text: Optional[str]) -> Optional[List[LifeBarState]]:
    """``time|life,...`` pairs -> LifeBarState list (None when absent)."""
    if not text:
        return None
    states = []
    for entry in text.rstrip(",").split(","):
        time_str, life_str = entry.split("|")[:2]
        states.append(LifeBarState(int(float(time_str)), float(life_str)))
    return states


def _parse_events(stream: bytes) -> Tuple[Optional[int], np.ndarray]:
    """LZMA event stream -> (rng_seed, (N, 3) float32 [abs_time, x, y]).

    Events arrive as ``delta|x|y|keys`` quadruples; deltas accumulate into
    absolute times, and the result is time-sorted.
    """
    text = lzma.decompress(stream, format=lzma.FORMAT_AUTO).decode("ascii").rstrip(",")
    if not text:
        return None, np.zeros((0, 3), dtype=np.float32)

    fields = np.array([e.split("|") for e in text.split(",")], dtype=np.float64)

    rng_seed = None
    if fields.shape[0] and fields[-1, 0] == _RNG_SEED_MARKER:
        rng_seed = int(fields[-1, 3])  # seed rides in the keys column
        fields = fields[:-1]

    times = np.cumsum(fields[:, 0])
    table = np.column_stack([times, fields[:, 1], fields[:, 2]]).astype(np.float32)
    return rng_seed, table[table[:, 0].argsort()]


class Replay:
    """Parsed .osr replay with an interpolated cursor surface.

    Exposes every header field by name plus ``events`` (time-sorted (N, 3)
    ``[abs_ms, x, y]``), ``rng_seed``, and ``cursor(t)``.
    """

    # (attribute, struct format) pairs in on-disk order; "s" = .osr string
    _HEADER = (
        ("game_version", "i"),
        ("beatmap_hash", "s"),
        ("username", "s"),
        ("replay_hash", "s"),
        ("count_300", "h"),
        ("count_100", "h"),
        ("count_50", "h"),
        ("count_geki", "h"),
        ("count_katu", "h"),
        ("count_miss", "h"),
        ("score", "i"),
        ("max_combo", "h"),
        ("perfect", "?"),
        ("mods", "i"),
    )

    def __init__(self, replay_path: str, to_np: bool = True) -> None:
        # to_np kept for reference-API compatibility; the numpy table is
        # always built (there is no non-numpy consumer in this repo)
        del to_np
        r = _Reader(Path(replay_path).read_bytes())

        self.mode = GameMode(r.scalar("b"))
        if self.mode is not GameMode.STANDARD:
            raise ValueError("Invalid game mode")

        for name, fmt in self._HEADER:
            setattr(self, name, r.string() if fmt == "s" else r.scalar(fmt))

        self.life_bar = _parse_lifebar(r.string())

        ticks = r.scalar("q")
        self.timestamp = (
            datetime.datetime.min + datetime.timedelta(microseconds=ticks / _TICKS_PER_US)
        ).replace(tzinfo=datetime.timezone.utc)

        self.rng_seed, self._events = _parse_events(r.take(r.scalar("i")))

        try:
            self.replay_id = r.scalar("q")
        except struct.error:  # pre-2014 replays store a 32-bit id
            self.replay_id = r.scalar("l")

    @property
    def events(self) -> np.ndarray:
        return self._events

    def cursor(self, t: float) -> Tuple[Tuple[float, float], float]:
        """Cursor position at absolute time t (ms) by linear interpolation,
        plus the time remaining until the next recorded event."""
        times = self._events[:, 0]
        if self._events.shape[0] == 0 or t < times[0]:
            raise ValueError(f"Replay data does not contain any events before {t}")
        x = float(np.interp(t, times, self._events[:, 1]))
        y = float(np.interp(t, times, self._events[:, 2]))
        nxt = int(np.searchsorted(times, t, side="right"))
        until_next = float(times[nxt] - t) if nxt < times.shape[0] else 0.0
        return (x, y), until_next

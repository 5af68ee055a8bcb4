"""Host-side input pipeline: npz shard datasets, augmentation, bucketed
padding collation, and threaded prefetch.

Capability parity with reference osu_fusion/library/{dataset,augment}.py and
trainer.py's collate (:74-95): the same four dataset modes (full-sequence
<= 65536, random-length 2048-8192, fixed subsequence 4096, dummy), NaN
rejection, cursor-flip augmentation with p=0.5 each axis, per-epoch reshuffle,
and padding with x=-1 / a=-23 emitting ``orig_len``.

TPU-first differences:
- batch lengths are padded up to a BUCKET multiple (default 1024) instead of
  the exact batch max: XLA compiles one program per bucket instead of one per
  length, bounding recompiles (SURVEY.md "hard parts" #1);
- prefetch is a background thread feeding a bounded queue (the reference
  forks DataLoader worker processes; our decode work is vectorized numpy that
  releases the GIL, so threads overlap host prep with device steps without
  fork overhead).
"""

from __future__ import annotations

import random
import threading
from pathlib import Path
from queue import Queue
from typing import Iterator, List, Sequence, Tuple

import numpy as np

from osufusion_tpu.audio.constants import AUDIO_DIM, CONTEXT_DIM
from osufusion_tpu.codec.encode import BeatmapEncoding, TOTAL_DIM

X_PAD = -1.0
A_PAD = -23.0
BUCKET = 1024

Sample = Tuple[np.ndarray, np.ndarray, np.ndarray]  # x (6,N), a (96,N), c (5,)
Batch = Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]  # + orig_len (B,)


def flip_cursor_horizontal(x: np.ndarray) -> np.ndarray:
    x = x.copy()
    x[BeatmapEncoding.CURSOR_X] = -x[BeatmapEncoding.CURSOR_X]
    return x


def flip_cursor_vertical(x: np.ndarray) -> np.ndarray:
    x = x.copy()
    x[BeatmapEncoding.CURSOR_Y] = -x[BeatmapEncoding.CURSOR_Y]
    return x


def get_new_context(x: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Re-rate a cropped segment: decode it to .osu text and recompute star
    rating for the conditioning vector (reference dataset.py:40-69). Uses the
    C++ difficulty core when built, Python otherwise."""
    import tempfile

    from osufusion_tpu.audio.constants import frame_times, normalize_context, unnormalize_context
    from osufusion_tpu.codec.decode import Metadata, decode_beatmap
    from osufusion_tpu.native import calculate_star_rating as native_sr
    from osufusion_tpu.osu.beatmap import Beatmap

    cs, ar, od, hp, _ = unnormalize_context(c).tolist()
    ft = frame_times(x.shape[-1])
    meta = Metadata("", "Dummy", "Dummy", "OsuFusion", cs, ar, od, hp)
    segment_osu = decode_beatmap(meta, x, ft, bpm=None, allow_beat_snap=False, verbose=False)

    with tempfile.TemporaryDirectory() as d:
        p = Path(d) / "segment.osu"
        p.write_text(segment_osu, encoding="utf-8")
        try:
            sr = native_sr(Beatmap(p))  # falls back to Python when not built
        except ValueError:
            sr = 0.0

    return normalize_context(np.array([cs, ar, od, hp, min(max(sr, 0.0), 20.0)], dtype=np.float32))


def load_tensor(map_file: Path) -> Sample:
    """npz shard -> float32 arrays with NaN quarantine (reference dataset.py:25-37)."""
    map_data = np.load(map_file)
    audio_file = map_file.parent / str(map_data["spec_path"])
    audio_data = np.load(audio_file)
    x = map_data["x"].astype(np.float32)
    c = map_data["c"].astype(np.float32)
    a = audio_data["a"].astype(np.float32)
    if np.isnan(x).any() or np.isnan(a).any() or np.isnan(c).any():
        raise ValueError("Invalid values in map file")
    n = min(x.shape[-1], a.shape[-1])
    return x[..., :n], a[..., :n], c


def filter_dataset(paths: Sequence[Path], max_length: int) -> List[Path]:
    """Drop maps longer than max_length (reference trainer.py:42-48)."""
    kept = []
    for p in paths:
        try:
            with np.load(p) as d:
                if d["x"].shape[-1] <= max_length:
                    kept.append(p)
        except Exception:
            continue
    return kept


class StreamDataset:
    """Iterable over map shards with augmentation and per-epoch reshuffle."""

    def __init__(
        self,
        dataset: Sequence[Path],
        sample_density: float = 1.0,
        segment_sr: bool = False,
        flip_horizontal_prob: float = 0.5,
        flip_vertical_prob: float = 0.5,
        seed: int = 0,
    ) -> None:
        if not (0 < sample_density <= 1):
            raise ValueError("sample_density must be between 0 and 1")
        self.dataset = list(dataset)
        self.sample_density = sample_density
        self.segment_sr = segment_sr
        self.flip_horizontal_prob = flip_horizontal_prob
        self.flip_vertical_prob = flip_vertical_prob
        self.rng = random.Random(seed)

    def sample_stream(self, map_file: Path) -> Iterator[Sample]:
        raise NotImplementedError

    def __iter__(self) -> Iterator[Sample]:
        order = self.rng.sample(self.dataset, int(len(self.dataset) * self.sample_density))
        for map_file in order:
            for x, a, c in self.sample_stream(map_file):
                if self.segment_sr:
                    c = get_new_context(x, c)
                if self.rng.random() < self.flip_horizontal_prob:
                    x = flip_cursor_horizontal(x)
                if self.rng.random() < self.flip_vertical_prob:
                    x = flip_cursor_vertical(x)
                yield x, a, c
        self.rng.shuffle(self.dataset)

    def __len__(self) -> int:
        return len(self.dataset)


class DummyDataset(StreamDataset):
    """Synthetic random tensors with realistic shapes (reference dataset.py:118-131)."""

    MIN_LENGTH = 2048
    MAX_LENGTH = 8192

    def __init__(self, num_samples: int = 64, seed: int = 0, min_length: int = None, max_length: int = None) -> None:
        super().__init__([Path(f"dummy_{i}") for i in range(num_samples)], seed=seed)
        self.min_length = min_length or self.MIN_LENGTH
        self.max_length = max_length or self.MAX_LENGTH
        self.np_rng = np.random.default_rng(seed)

    def sample_stream(self, _: Path) -> Iterator[Sample]:
        length = self.rng.randint(self.min_length, self.max_length)
        x = self.np_rng.standard_normal((TOTAL_DIM, length), dtype=np.float32)
        a = self.np_rng.standard_normal((AUDIO_DIM, length), dtype=np.float32)
        c = self.np_rng.standard_normal(CONTEXT_DIM).astype(np.float32)
        yield x, a, c


class FullSequenceDataset(StreamDataset):
    MAX_LENGTH = 65536

    def sample_stream(self, map_file: Path) -> Iterator[Sample]:
        try:
            x, a, c = load_tensor(map_file)
        except ValueError:
            return
        if x.shape[-1] > self.MAX_LENGTH:
            return
        yield x[..., : self.MAX_LENGTH], a[..., : self.MAX_LENGTH], c


class RandomLengthDataset(StreamDataset):
    MIN_LENGTH = 2048
    MAX_LENGTH = 8192

    def sample_stream(self, map_file: Path) -> Iterator[Sample]:
        try:
            x, a, c = load_tensor(map_file)
        except ValueError:
            return
        n = x.shape[-1]
        if n < self.MIN_LENGTH:
            return
        length = self.rng.randint(self.MIN_LENGTH, min(self.MAX_LENGTH, n))
        start = self.rng.randint(0, n - length)
        yield x[..., start : start + length], a[..., start : start + length], c


class SubsequenceDataset(StreamDataset):
    def __init__(self, *args, sequence_length: int = 4096, **kwargs) -> None:
        super().__init__(*args, **kwargs)
        self.sequence_length = sequence_length

    def sample_stream(self, map_file: Path) -> Iterator[Sample]:
        try:
            x, a, c = load_tensor(map_file)
        except ValueError:
            return
        n = x.shape[-1]
        if self.sequence_length > n:
            return
        start = self.rng.randint(0, n - self.sequence_length)
        yield x[..., start : start + self.sequence_length], a[..., start : start + self.sequence_length], c


def collate(batch: Sequence[Sample], bucket: int = BUCKET) -> Batch:
    """Pad each sample to the batch's bucket-rounded max length.

    x pads with -1 (silence signal), a with -23 (log-VQT silence); returns
    ``orig_len`` for loss masking (reference trainer.py:74-95). Bucketing the
    padded length bounds the number of distinct shapes XLA sees.
    """
    max_len = max(x.shape[-1] for x, _, _ in batch)
    target = ((max_len + bucket - 1) // bucket) * bucket

    out_x = np.full((len(batch), TOTAL_DIM, target), X_PAD, dtype=np.float32)
    out_a = np.full((len(batch), AUDIO_DIM, target), A_PAD, dtype=np.float32)
    out_c = np.zeros((len(batch), CONTEXT_DIM), dtype=np.float32)
    orig_len = np.zeros(len(batch), dtype=np.int32)

    for i, (x, a, c) in enumerate(batch):
        n = x.shape[-1]
        out_x[i, :, :n] = x
        out_a[i, :, :n] = a
        out_c[i] = c
        orig_len[i] = n
    return out_x, out_a, out_c, orig_len


def batched(dataset: StreamDataset, batch_size: int, bucket: int = BUCKET) -> Iterator[Batch]:
    """Infinite cycle of collated batches (reference trainer.py:51-54 cycle)."""
    while True:
        buf: List[Sample] = []
        for sample in dataset:
            buf.append(sample)
            if len(buf) == batch_size:
                yield collate(buf, bucket)
                buf = []


def prefetch(it: Iterator[Batch], depth: int = 4) -> Iterator[Batch]:
    """Background-thread prefetch with a bounded queue."""
    q: Queue = Queue(maxsize=depth)
    stop = object()

    def worker() -> None:
        try:
            for item in it:
                q.put(item)
        finally:
            q.put(stop)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is stop:
            return
        yield item


def make_dataset(mode: str, paths: Sequence[Path], seed: int = 0, segment_length: int = 4096) -> StreamDataset:
    if mode == "dummy":
        # mirror the reference's "1/2x to 2x of context" dummy lengths, scaled
        # to the configured segment length so smoke runs stay small
        return DummyDataset(seed=seed, min_length=segment_length // 2, max_length=segment_length * 2)
    if mode == "full-sequence":
        return FullSequenceDataset(paths, seed=seed)
    if mode == "random-length":
        return RandomLengthDataset(paths, seed=seed)
    if mode == "subsequence":
        return SubsequenceDataset(paths, seed=seed, sequence_length=segment_length)
    raise ValueError(f"unknown dataset mode: {mode}")

"""Offline preprocessing core: .osu + audio -> .map.npz / spec.npz shards.

Capability parity with reference osu_fusion/scripts/dataset_creator.py
(:119-180): meta-parse + mode-0 filter, star-rating conditioning vector, full
parse, shared-spectrogram caching per audio file, beatmap encoding at frame
times, compressed npz output with a relative spec path.

The reference guards the shared spec with per-path multiprocessing locks +
exponential backoff + EOF-corruption repair (:82-116); here the spec is
written via ATOMIC RENAME (tmp -> final), which makes concurrent writers safe
without locks (SURVEY.md section 5.2) — a reader either sees the complete old
file or the complete new one.
"""

from __future__ import annotations

import os
import tempfile
from pathlib import Path
from typing import Optional

import numpy as np

from osufusion_tpu.audio import frame_times, load_audio, normalize_context
from osufusion_tpu.codec.encode import encode_beatmap
from osufusion_tpu.native import calculate_star_rating  # C++ core, Python fallback
from osufusion_tpu.osu.beatmap import Beatmap


def get_audio_spec(beatmap: Beatmap, spec_path: Path) -> Optional[np.ndarray]:
    if spec_path.exists():
        try:
            return np.load(spec_path)["a"]
        except Exception:
            spec_path.unlink(missing_ok=True)  # corrupt: recompute below

    try:
        spec = np.asarray(load_audio(beatmap.audio_filename))
    except Exception as e:  # noqa: BLE001 — per-map containment
        print(f"Failed to load audio {beatmap.audio_filename}: {e}")
        return None

    spec_path.parent.mkdir(parents=True, exist_ok=True)
    # suffix must end in .npz or np.savez silently writes to "<tmp>.npz"
    fd, tmp = tempfile.mkstemp(dir=spec_path.parent, suffix=".tmp.npz")
    os.close(fd)
    try:
        # float16, UNCOMPRESSED: the spec is loaded once per training sample
        # and zlib decompression of the (96, T) float32 spectrogram was
        # measured as ~85% of the whole per-sample load (66 of 77 ms on the
        # round-5 host) — the input pipeline's single largest cost. f16 holds
        # log-VQT values (range ~[-23, 5]) with ~1e-3 relative error, well
        # under the bf16 the model casts to anyway, and an uncompressed f16
        # store is no larger on disk than the compressed f32 while loading
        # as a plain memcpy. Readers are unchanged (np.load + astype).
        np.savez(tmp, a=spec.astype(np.float16))
        os.replace(tmp, spec_path)  # atomic publish
    finally:
        Path(tmp).unlink(missing_ok=True)
    return spec


def prepare_map(data_dir: Path, map_file: Path) -> bool:
    """Process one .osu file into (x, c, spec_path) npz. Returns success."""
    try:
        beatmap = Beatmap(map_file, meta_only=True)
    except Exception as e:  # noqa: BLE001
        print(f"Failed to load beatmap {map_file}: {e}")
        return False

    if beatmap.mode != 0:
        return False

    audio_file_dir = "_".join([beatmap.audio_filename.stem, *(s[1:] for s in beatmap.audio_filename.suffixes)])
    map_dir = Path(data_dir) / map_file.parent.name / audio_file_dir
    spec_path = map_dir / "spec.npz"
    map_path = map_dir.parent / f"{map_file.stem}.map.npz"

    if spec_path.exists() and map_path.exists():
        return True

    try:
        beatmap.parse_map_data()
    except Exception as e:  # noqa: BLE001
        print(f"Failed to parse beatmap {map_file}: {e}")
        return False

    try:
        sr = min(max(calculate_star_rating(beatmap), 0.0), 20.0)
    except Exception as e:  # noqa: BLE001
        print(f"Failed difficulty for {map_file}: {e}")
        return False

    spec = get_audio_spec(beatmap, spec_path)
    if spec is None:
        return False

    ft = frame_times(spec.shape[-1])
    x = encode_beatmap(beatmap, ft)
    c = normalize_context(np.array([beatmap.cs, beatmap.ar, beatmap.od, beatmap.hp, sr], dtype=np.float32))

    map_path.parent.mkdir(parents=True, exist_ok=True)
    rel_spec = spec_path.relative_to(map_path.parent)
    np.savez_compressed(map_path, x=x, c=c, spec_path=str(rel_spec).replace("\\", "/"))
    return True

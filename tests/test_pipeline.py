"""End-to-end pipeline tests: difficulty, preprocessing, serving."""

import numpy as np
import pytest
from scipy.io import wavfile

from osufusion_tpu.audio import SR
from osufusion_tpu.osu import Beatmap
from osufusion_tpu.osu.difficulty import calculate_star_rating, calculate_star_rating_from_text
from osufusion_tpu.train.preprocess import prepare_map
from tests.helpers import SYNTHETIC_OSU, write_synthetic_map


def write_audio(path, seconds=12.0, freq=440.0):
    t = np.arange(int(SR * seconds)) / SR
    wave = (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    wavfile.write(path, SR, (wave * 32767).astype(np.int16))


def test_star_rating_reasonable(tmp_path):
    bm = Beatmap(write_synthetic_map(tmp_path))
    sr = calculate_star_rating(bm)
    assert 0.0 < sr < 12.0


def test_star_rating_scales_with_density(tmp_path):
    """Twice the object density must rate harder."""
    def mk(name, step_ms):
        lines = [f"{100 + (i % 8) * 40},{100 + (i % 5) * 30},{1000 + i * step_ms},1,0,0:0:0:0:" for i in range(60)]
        text = SYNTHETIC_OSU.split("[HitObjects]")[0] + "[HitObjects]\n" + "\n".join(lines) + "\n"
        p = tmp_path / name
        p.write_text(text, encoding="utf-8")
        return Beatmap(p)

    slow = calculate_star_rating(mk("slow.osu", 400))
    fast = calculate_star_rating(mk("fast.osu", 150))
    assert fast > slow


def test_star_rating_from_text(tmp_path):
    sr = calculate_star_rating_from_text(SYNTHETIC_OSU)
    assert sr > 0


_GOLDEN_HEADER = """osu file format v14

[General]
AudioFilename: audio.mp3
Mode: 0

[Metadata]
Title: G
Artist: G
Creator: G
Version: G

[Difficulty]
HPDrainRate: 5
CircleSize: {cs}
OverallDifficulty: 6
ApproachRate: 8
SliderMultiplier: 1.4
SliderTickRate: 1

[TimingPoints]
1000,500,4,1,0,50,1,0

[HitObjects]
"""


def _uniform_pattern(tmp_path, name, cs, spacing, dt, n):
    lines, x = [], 100.0
    for i in range(n):
        lines.append(f"{int(x)},200,{1000 + i * dt},1,0,0:0:0:0:")
        x += spacing if i % 2 == 0 else -spacing
    p = tmp_path / f"{name}.osu"
    p.write_text(_GOLDEN_HEADER.format(cs=cs) + "\n".join(lines) + "\n", encoding="utf-8")
    return Beatmap(p)


def test_star_rating_golden_values(tmp_path):
    """Golden DRIFT PINS for canonical patterns under the modern (Nov-2021
    rework) algorithm — they pin the implementation and its constants against
    silent change, they do not claim rosu-pp bit-parity (rosu-pp is not
    installable offline — reference scripts/dataset_creator.py:139-142;
    deviations are documented in osu/difficulty.py's module docstring).

    Plausibility context: the "stream" fixture is a 200-note 180 BPM 1/4
    zigzag at 100 px — normalized spacing 137 px, PAST the 125 px
    single-spacing threshold, with a full direction reversal (acute angle
    bonus) at every note; the modern algorithm rates such patterns like the
    1/4-jump deathstreams they are, well above the ~6.5* the early-ppv2
    family gave the same fixture. The 1/2 jumps and the sparse pattern move
    much less between the two algorithm families.
    """
    cases = {
        ("stream", 4, 100, 83, 200): 9.059402,
        ("jumps", 4, 220, 166, 120): 5.142194,
        ("easy", 3, 80, 400, 60): 1.567550,
    }
    for (name, cs, spacing, dt, n), want in cases.items():
        got = calculate_star_rating(_uniform_pattern(tmp_path, name, cs, spacing, dt, n))
        assert got == pytest.approx(want, rel=1e-5), f"{name}: {got} != {want}"


def test_star_rating_monotonic_properties(tmp_path):
    """Directional invariants any osu!std difficulty algorithm satisfies."""
    base = calculate_star_rating(_uniform_pattern(tmp_path, "base", 4, 120, 200, 100))
    wider = calculate_star_rating(_uniform_pattern(tmp_path, "wider", 4, 200, 200, 100))
    faster = calculate_star_rating(_uniform_pattern(tmp_path, "faster", 4, 120, 120, 100))
    small_circles = calculate_star_rating(_uniform_pattern(tmp_path, "cs7", 7, 120, 200, 100))
    assert wider > base, "larger spacing must rate harder (aim)"
    assert faster > base, "higher density must rate harder (speed)"
    assert small_circles > base, "smaller circles must rate harder"
    # the 0.9^i weighting saturates: doubling length adds < 15%
    longer = calculate_star_rating(_uniform_pattern(tmp_path, "long", 4, 120, 200, 200))
    assert longer < base * 1.15


def test_prepare_map_end_to_end(tmp_path):
    map_file = write_synthetic_map(tmp_path)
    # the synthetic map references audio.mp3; write a wav and point to it
    text = map_file.read_text().replace("audio.mp3", "audio.wav")
    map_file.write_text(text)
    write_audio(map_file.parent / "audio.wav")

    out_dir = tmp_path / "dataset"
    assert prepare_map(out_dir, map_file)

    maps = list(out_dir.rglob("*.map.npz"))
    specs = list(out_dir.rglob("spec.npz"))
    assert len(maps) == 1 and len(specs) == 1

    d = np.load(maps[0])
    x, c = d["x"], d["c"]
    assert x.shape[0] == 6
    assert c.shape == (5,)
    assert np.all(np.abs(c) <= 1.0)
    spec = np.load(maps[0].parent / str(d["spec_path"]))["a"]
    assert spec.shape[0] == 96
    assert spec.shape[-1] == x.shape[-1]
    # the spec ships f16 + uncompressed: zlib decompress of the f32 spec was
    # ~85% of the training pipeline's per-sample load (round-5 measurement)
    assert spec.dtype == np.float16

    # idempotent: second call short-circuits on the cache
    assert prepare_map(out_dir, map_file)


def test_prepare_map_rejects_non_std_mode(tmp_path):
    map_file = write_synthetic_map(tmp_path)
    text = map_file.read_text().replace("Mode: 0", "Mode: 3")
    map_file.write_text(text)
    assert not prepare_map(tmp_path / "dataset", map_file)


def test_generate_beatmap_end_to_end(tmp_path):
    """Tiny model: audio in -> .osz with parseable .osu files out."""
    import jax

    from osufusion_tpu.config import DiffusionConfig, ModelConfig
    from osufusion_tpu.models import DiffusionModel
    from osufusion_tpu.serve.generate import generate_beatmap

    audio = tmp_path / "song.wav"
    write_audio(audio, seconds=6.0)

    cfg = ModelConfig(
        dim_h=16,
        dim_h_mult=(1, 2),
        num_layer_blocks=(1, 1),
        num_middle_transformers=1,
        attn_dim_head=8,
        attn_heads=2,
        attn_kv_heads=1,
        attn_context_len=64,
        dtype="float32",
    )
    model = DiffusionModel(cfg, DiffusionConfig(sampling_timesteps=2))
    params = model.init_params(jax.random.PRNGKey(0), seq_len=64)

    out = tmp_path / "gen.osz"
    data, osu_texts = generate_beatmap(
        model, params, audio, num_samples=2, sampling_timesteps=2, cond_scale=1.0, output_path=out
    )
    assert out.exists() and len(data) > 1000
    assert len(osu_texts) == 2

    import zipfile

    with zipfile.ZipFile(out) as z:
        names = z.namelist()
    assert "song.wav" in names
    assert sum(n.endswith(".osu") for n in names) == 2
    # decoded .osu must be structurally valid (template + sections)
    assert "[HitObjects]" in osu_texts[0]
    assert "osu file format v14" in osu_texts[0]

    # the sampler override plumbs through serve to sample(method=): same
    # audio through DPM-Solver++(2M) must also yield a valid .osz
    data_dpm, texts_dpm = generate_beatmap(
        model, params, audio, num_samples=1, sampling_timesteps=4, cond_scale=1.0, sampler="dpmpp-2m"
    )
    assert len(texts_dpm) == 1 and "[HitObjects]" in texts_dpm[0]

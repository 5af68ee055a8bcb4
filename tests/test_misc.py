"""Tests: replay codec, continuous-time scheduler, serialization, config."""

import io
import lzma
import struct

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from osufusion_tpu.config import Config, DiffusionConfig, ModelConfig, TrainConfig
from osufusion_tpu.models.continuous import (
    GaussianDiffusionContinuousTimes,
    alpha_cosine_log_snr,
    beta_linear_log_snr,
    log_snr_to_alpha_sigma,
)
from osufusion_tpu.osu.replay import GameMode, Replay
from osufusion_tpu.utils.serialization import load_safetensors, save_safetensors


# ------------------------------------------------------------------ replay


def _leb_string(s: str) -> bytes:
    if s is None:
        return b"\x00"
    data = s.encode("utf-8")
    out = b"\x0b"
    n = len(data)
    while True:
        b = n & 0x7F
        n >>= 7
        out += bytes([b | (0x80 if n else 0)])
        if not n:
            break
    return out + data


def write_replay(path, events="0|100|100|1,16|150|150|0,16|200|200|2,-12345|0|0|777"):
    buf = io.BytesIO()
    buf.write(struct.pack("<b", 0))  # mode standard
    buf.write(struct.pack("<i", 20240101))  # version
    buf.write(_leb_string("beatmaphash"))
    buf.write(_leb_string("player"))
    buf.write(_leb_string("replayhash"))
    for _ in range(6):
        buf.write(struct.pack("<h", 100))
    buf.write(struct.pack("<i", 1000000))  # score
    buf.write(struct.pack("<h", 500))  # combo
    buf.write(struct.pack("<?", True))
    buf.write(struct.pack("<i", 0))  # mods
    buf.write(_leb_string("0|1.0,1000|0.5"))  # lifebar
    buf.write(struct.pack("<q", 630822816000000000))  # ticks
    comp = lzma.compress(events.encode("ascii"))
    buf.write(struct.pack("<i", len(comp)))
    buf.write(comp)
    buf.write(struct.pack("<q", 12345))  # replay id
    path.write_bytes(buf.getvalue())


def test_replay_roundtrip(tmp_path):
    p = tmp_path / "test.osr"
    write_replay(p)
    r = Replay(str(p))
    assert r.mode == GameMode.STANDARD
    assert r.username == "player"
    assert r.max_combo == 500
    assert r.rng_seed == 777
    assert r.events.shape == (3, 3)
    # cumulative times 0, 16, 32
    np.testing.assert_allclose(r.events[:, 0], [0, 16, 32])
    (x, y), _ = r.cursor(8.0)  # halfway between events 0 and 1
    assert x == pytest.approx(125.0)
    assert y == pytest.approx(125.0)
    assert r.life_bar is not None and r.life_bar[1].life == 0.5


def test_replay_rejects_wrong_mode(tmp_path):
    p = tmp_path / "mania.osr"
    write_replay(p)
    data = bytearray(p.read_bytes())
    data[0] = 3  # mania
    p.write_bytes(bytes(data))
    with pytest.raises(ValueError, match="Invalid game mode"):
        Replay(str(p))


# ------------------------------------------------- continuous-time scheduler


def test_logsnr_schedules_monotone():
    t = jnp.linspace(0.01, 0.99, 50)
    for fn in (beta_linear_log_snr, alpha_cosine_log_snr):
        vals = np.asarray(fn(t))
        assert np.all(np.diff(vals) < 0)  # SNR decreases as t -> 1


def test_alpha_sigma_unit_energy():
    log_snr = jnp.linspace(-10, 10, 20)
    alpha, sigma = log_snr_to_alpha_sigma(log_snr)
    np.testing.assert_allclose(np.asarray(alpha**2 + sigma**2), 1.0, atol=1e-6)


def test_q_sample_and_predict_start_invert():
    sched = GaussianDiffusionContinuousTimes("linear", timesteps=100)
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.uniform(rng, (2, 4, 8), minval=-1, maxval=1)
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t = jnp.array([0.3, 0.7])
    x_t, log_snr, alpha, sigma = sched.q_sample(x0, t, noise)
    x0_hat = sched.predict_start_from_noise(x_t, t, noise)
    np.testing.assert_allclose(np.asarray(x0_hat), np.asarray(x0), rtol=1e-4, atol=1e-5)


def test_q_posterior_shapes_and_sampling_times():
    sched = GaussianDiffusionContinuousTimes("cosine", timesteps=10)
    x0 = jnp.zeros((2, 4, 8))
    xt = jnp.ones((2, 4, 8))
    mean, var, logvar = sched.q_posterior(x0, xt, jnp.array([0.5, 0.9]))
    assert mean.shape == x0.shape
    assert np.all(np.asarray(var) >= 0)
    ts, ts_next = sched.get_sampling_timesteps(batch_size=3)
    assert ts.shape == (10, 3)
    assert float(ts[0, 0]) == 1.0 and float(ts_next[-1, 0]) == 0.0


# ------------------------------------------------------------ serialization


def test_safetensors_roundtrip(tmp_path):
    tree = {"a": {"kernel": np.arange(6, dtype=np.float32).reshape(2, 3), "bias": np.zeros(3, np.float32)}, "b": np.ones(4, np.float32)}
    save_safetensors(tree, tmp_path / "m.safetensors")
    back = load_safetensors(tmp_path / "m.safetensors")
    np.testing.assert_array_equal(back["a"]["kernel"], tree["a"]["kernel"])
    np.testing.assert_array_equal(back["b"], tree["b"])


def test_config_json_roundtrip(tmp_path):
    cfg = Config(
        model=ModelConfig(dim_h=64, dim_h_mult=(1, 2, 3)),
        diffusion=DiffusionConfig(objective="rectified-flow"),
        train=TrainConfig(batch_size=7),
    )
    cfg.save(tmp_path / "config.json")
    back = Config.load(tmp_path / "config.json")
    assert back.model.dim_h == 64
    assert back.model.dim_h_mult == (1, 2, 3)
    assert back.diffusion.objective == "rectified-flow"
    assert back.train.batch_size == 7


def test_lenient_load_reports_and_fills(capsys):
    from osufusion_tpu.utils.serialization import load_params_lenient

    like = {"a": {"kernel": jnp.zeros((2, 3)), "bias": jnp.zeros(3)}, "b": jnp.zeros(4)}
    loaded = {"a": {"kernel": np.ones((2, 3), np.float32)}, "extra": np.ones(1, np.float32)}
    out = load_params_lenient(like, loaded)
    np.testing.assert_array_equal(np.asarray(out["a"]["kernel"]), 1.0)
    np.testing.assert_array_equal(np.asarray(out["a"]["bias"]), 0.0)  # missing: kept
    captured = capsys.readouterr().out
    assert "Missing keys" in captured and "Unexpected keys" in captured


def test_lenient_load_reports_shape_mismatch(capsys):
    # a key that exists with the wrong shape must keep the init AND say so
    # (regression: fine-tuning a checkpoint with a mismatched --model-dim
    # silently trained half-random weights)
    from osufusion_tpu.utils.serialization import load_params_lenient

    like = {"a": {"kernel": jnp.zeros((2, 3))}}
    loaded = {"a": {"kernel": np.ones((4, 3), np.float32)}}
    out = load_params_lenient(like, loaded)
    np.testing.assert_array_equal(np.asarray(out["a"]["kernel"]), 0.0)
    assert "Shape-mismatched" in capsys.readouterr().out


def test_peft_adopts_pretrain_architecture(tmp_path):
    # trainer_peft must build the checkpoint's architecture (config.json next
    # to model.safetensors), keeping only runtime knobs from the CLI
    import dataclasses

    from trainer_peft import adopt_pretrain_architecture

    Config(model=ModelConfig(dim_h=48, attn_heads=3, attn_dim_head=16)).save(
        tmp_path / "config.json"
    )
    cli = Config(
        model=ModelConfig(dim_h=512, attn_heads=16, remat=True, quant="fp8")
    )
    out = adopt_pretrain_architecture(cli, tmp_path / "model.safetensors")
    assert out.model.dim_h == 48 and out.model.attn_heads == 3
    assert out.model.attn_dim_head == 16
    assert out.model.remat is True and out.model.quant == "fp8"
    # no sibling config.json -> CLI architecture kept unchanged
    out2 = adopt_pretrain_architecture(cli, tmp_path / "elsewhere" / "model.safetensors")
    assert out2.model.dim_h == 512
    assert adopt_pretrain_architecture(cli, None).model.dim_h == 512

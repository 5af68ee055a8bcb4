"""Training loop tests on a virtual 8-device CPU mesh: sharded train step,
gradient accumulation, checkpoint round trip, data pipeline."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from osufusion_tpu.config import Config, DiffusionConfig, ModelConfig, TrainConfig
from osufusion_tpu.models import build_model
from osufusion_tpu.parallel import make_mesh, param_shardings
from osufusion_tpu.train import data as D
from osufusion_tpu.train.loop import (
    checkpoint_manager,
    init_state,
    make_train_step,
    restore_checkpoint,
    save_checkpoint,
    shard_state,
)

TINY_MODEL = ModelConfig(
    dim_h=32,
    dim_h_mult=(1, 2),
    num_layer_blocks=(1, 1),
    num_middle_transformers=1,
    attn_dim_head=16,
    attn_heads=4,
    attn_kv_heads=1,
    attn_context_len=64,
    dtype="float32",
)


def tiny_config(**train_kwargs) -> Config:
    defaults = dict(total_steps=10, warmup_steps=2, lr=1e-3, batch_size=8)
    defaults.update(train_kwargs)
    return Config(model=TINY_MODEL, diffusion=DiffusionConfig(), train=TrainConfig(**defaults))


def np_batch(B=8, N=64, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-1, 1, (B, 6, N)).astype(np.float32)
    a = rng.normal(-10, 1, (B, 96, N)).astype(np.float32)
    c = rng.uniform(-1, 1, (B, 5)).astype(np.float32)
    orig_len = np.full(B, N, dtype=np.int32)
    return x, a, c, orig_len


def test_devices_virtualized():
    assert len(jax.devices()) == 8


def test_train_step_dp_loss_decreases():
    cfg = tiny_config()
    model = build_model(cfg.model, cfg.diffusion)
    mesh = make_mesh(data=8, model=1)
    state = init_state(model, cfg, jax.random.PRNGKey(0), seq_len=64)
    state, _ = shard_state(state, mesh)
    step = make_train_step(model, cfg, mesh)

    batch = np_batch()
    losses = []
    for _ in range(24):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    # stochastic objective (random t + noise per step): compare averages
    assert np.mean(losses[-6:]) < np.mean(losses[:6])
    assert int(state.step) == 24
    assert float(metrics["grad_norm"]) > 0


def test_train_step_dp_tp_mesh():
    """2x4 mesh: DP + tensor parallelism over attention/FF params."""
    cfg = tiny_config(batch_size=4, mesh_data=2, mesh_model=4)
    model = build_model(cfg.model, cfg.diffusion)
    mesh = make_mesh(data=2, model=4)

    state = init_state(model, cfg, jax.random.PRNGKey(0), seq_len=64)
    shardings = param_shardings(state.params, mesh)
    specs = {s.spec for s in jax.tree.leaves(shardings)}
    # at least one param actually sharded over the model axis
    assert any(any(ax == "model" for ax in spec if ax) for spec in specs if spec)

    state, _ = shard_state(state, mesh)
    step = make_train_step(model, cfg, mesh)
    state, metrics = step(state, np_batch(B=4))
    assert np.isfinite(float(metrics["loss"]))


def test_tp_matches_dp_numerics():
    """The same train state stepped on a DP-only mesh and a DP x TP mesh must
    produce the same loss and parameters: GSPMD sharding is a layout choice,
    not a math change."""
    results = []
    for d, m in [(4, 1), (2, 4)]:
        cfg = tiny_config(batch_size=4, mesh_data=d, mesh_model=m)
        model = build_model(cfg.model, cfg.diffusion)
        mesh = make_mesh(data=d, model=m)
        state = init_state(model, cfg, jax.random.PRNGKey(0), seq_len=64)
        state, _ = shard_state(state, mesh)
        step = make_train_step(model, cfg, mesh)
        state, metrics = step(state, np_batch(B=4))
        results.append((float(metrics["loss"]), jax.tree.map(np.asarray, jax.device_get(state.params))))

    (loss_dp, p_dp), (loss_tp, p_tp) = results
    assert loss_dp == pytest.approx(loss_tp, rel=1e-4)
    for a, b in zip(jax.tree.leaves(p_dp), jax.tree.leaves(p_tp)):
        np.testing.assert_allclose(a, b, atol=5e-5, rtol=5e-4)


def test_grad_accumulation_matches_big_batch():
    cfg_accum = tiny_config(gradient_accumulation_steps=2, batch_size=4)
    model = build_model(cfg_accum.model, cfg_accum.diffusion)
    mesh = make_mesh(data=4, model=1)
    state = init_state(model, cfg_accum, jax.random.PRNGKey(0), seq_len=64)
    state, _ = shard_state(state, mesh)
    step = make_train_step(model, cfg_accum, mesh)
    x, a, c, ol = np_batch(B=8)
    micro = (x.reshape(2, 4, 6, 64), a.reshape(2, 4, 96, 64), c.reshape(2, 4, 5), ol.reshape(2, 4))
    state, metrics = step(state, micro)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1


def test_checkpoint_roundtrip(tmp_path):
    cfg = tiny_config()
    model = build_model(cfg.model, cfg.diffusion)
    state = init_state(model, cfg, jax.random.PRNGKey(0), seq_len=64)
    mngr = checkpoint_manager(tmp_path, max_to_keep=2)
    save_checkpoint(mngr, state)
    mngr.wait_until_finished()

    state2 = init_state(model, cfg, jax.random.PRNGKey(42), seq_len=64)
    restored = restore_checkpoint(mngr, state2)
    for p1, p2 in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    assert int(restored.step) == int(state.step)


def test_checkpoint_pruning(tmp_path):
    cfg = tiny_config()
    model = build_model(cfg.model, cfg.diffusion)
    state = init_state(model, cfg, jax.random.PRNGKey(0), seq_len=64)
    mngr = checkpoint_manager(tmp_path, max_to_keep=2)
    for s in range(4):
        state = state.replace(step=jnp.asarray(s, jnp.int32))
        save_checkpoint(mngr, state)
    mngr.wait_until_finished()
    assert sorted(mngr.all_steps()) == [2, 3]


# ------------------------------------------------------------------ data


def test_dummy_dataset_and_collate():
    ds = D.DummyDataset(num_samples=4, seed=0, min_length=100, max_length=300)
    samples = list(ds)
    assert len(samples) == 4
    x, a, c, orig_len = D.collate(samples, bucket=128)
    assert x.shape[0] == 4 and x.shape[1] == 6
    assert x.shape[2] % 128 == 0
    assert a.shape[2] == x.shape[2]
    # padding values
    i = int(np.argmin(orig_len))
    assert np.all(x[i, :, orig_len[i] :] == -1.0)
    assert np.all(a[i, :, orig_len[i] :] == -23.0)


def test_npz_dataset_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    spec = rng.normal(-10, 3, (96, 500)).astype(np.float32)
    np.savez_compressed(tmp_path / "spec.npz", a=spec)
    x = rng.uniform(-1, 1, (6, 500)).astype(np.float32)
    c = rng.uniform(-1, 1, 5).astype(np.float32)
    np.savez_compressed(tmp_path / "m1.map.npz", x=x, c=c, spec_path="spec.npz")

    ds = D.SubsequenceDataset([tmp_path / "m1.map.npz"], sequence_length=256, seed=0)
    got = list(ds)
    assert len(got) == 1
    gx, ga, gc = got[0]
    assert gx.shape == (6, 256) and ga.shape == (96, 256)
    np.testing.assert_array_equal(gc, c)


def test_nan_rejection(tmp_path):
    spec = np.full((96, 100), np.nan, dtype=np.float32)
    np.savez_compressed(tmp_path / "spec.npz", a=spec)
    np.savez_compressed(
        tmp_path / "bad.map.npz",
        x=np.zeros((6, 100), np.float32),
        c=np.zeros(5, np.float32),
        spec_path="spec.npz",
    )
    with pytest.raises(ValueError):
        D.load_tensor(tmp_path / "bad.map.npz")
    # dataset classes quarantine the bad sample instead of crashing
    ds = D.SubsequenceDataset([tmp_path / "bad.map.npz"], sequence_length=50, seed=0)
    assert list(ds) == []


def test_cursor_flip_augment():
    x = np.random.default_rng(0).uniform(-1, 1, (6, 32)).astype(np.float32)
    fx = D.flip_cursor_horizontal(x)
    np.testing.assert_array_equal(fx[4], -x[4])
    np.testing.assert_array_equal(fx[5], x[5])
    fy = D.flip_cursor_vertical(x)
    np.testing.assert_array_equal(fy[5], -x[5])


def test_filter_dataset(tmp_path):
    for name, n in [("short", 100), ("long", 3000)]:
        np.savez_compressed(
            tmp_path / f"{name}.map.npz",
            x=np.zeros((6, n), np.float32),
            c=np.zeros(5, np.float32),
            spec_path="spec.npz",
        )
    kept = D.filter_dataset(sorted(tmp_path.glob("*.map.npz")), max_length=1000)
    assert [p.stem for p in kept] == ["short.map"]


def test_segment_sr_recomputes_conditioning(tmp_path):
    """segment_sr re-rates the crop via decode + difficulty (reference
    dataset.py:40-69): the 5th conditioning scalar changes, first four stay."""
    from osufusion_tpu.audio.constants import normalize_context
    from osufusion_tpu.codec.encode import encode_beatmap
    from osufusion_tpu.audio.constants import frame_times
    from osufusion_tpu.osu import Beatmap
    from tests.helpers import write_synthetic_map

    bm = Beatmap(write_synthetic_map(tmp_path))
    x = encode_beatmap(bm, frame_times(1600))
    c = normalize_context(np.array([4.0, 8.0, 6.0, 5.0, 9.9], dtype=np.float32))
    c2 = D.get_new_context(x, c)
    np.testing.assert_allclose(c2[:4], c[:4], atol=1e-5)
    assert c2[4] != c[4]  # the fake 9.9-star rating was replaced
    assert -1.0 <= c2[4] <= 1.0


def test_pipeline_worker_count_invariance():
    """The batch stream is a pure function of (seed, position): any worker
    count produces identical batches in identical order."""
    def mk(workers):
        return D.DataPipeline(
            D.DummyDataset(num_samples=6, seed=3, min_length=64, max_length=128), 2, bucket=64, num_workers=workers
        )

    seq_pipe, par_pipe = mk(1), mk(4)
    ref = [next(seq_pipe) for _ in range(5)]
    par = [next(par_pipe) for _ in range(5)]
    for (x1, a1, c1, l1), (x2, a2, c2, l2) in zip(ref, par):
        np.testing.assert_array_equal(x1, x2)
        np.testing.assert_array_equal(a1, a2)
        np.testing.assert_array_equal(c1, c2)
        np.testing.assert_array_equal(l1, l2)


def test_pipeline_resume_matches_uninterrupted():
    """Checkpoint/resume of the data order (reference saves torch RNG state,
    trainer.py:148-177): restart from state() and the next batches match an
    uninterrupted run exactly — across an epoch boundary (6 samples, batch 2,
    4 batches > 1 epoch)."""

    def mk():
        return D.DataPipeline(D.DummyDataset(num_samples=6, seed=7, min_length=64, max_length=128), 2, bucket=64)

    full = mk()
    batches = [next(full) for _ in range(6)]

    interrupted = mk()
    for _ in range(3):
        next(interrupted)
    saved = interrupted.state()

    resumed = D.DataPipeline(
        D.DummyDataset(num_samples=6, seed=7, min_length=64, max_length=128), 2, bucket=64, start=saved
    )
    for want in batches[3:]:
        got = next(resumed)
        for w, g in zip(want, got):
            np.testing.assert_array_equal(w, g)


def test_process_invariant_pad_values():
    assert D.process_invariant_pad("subsequence", 4096) == 4096
    assert D.process_invariant_pad("random-length", 4096) == D.RandomLengthDataset.MAX_LENGTH
    assert D.process_invariant_pad("full-sequence", 4096) == D.FullSequenceDataset.MAX_LENGTH
    assert D.process_invariant_pad("full-sequence", 4096, max_length=8192) == 8192
    assert D.process_invariant_pad("dummy", 64) == 128
    with pytest.raises(ValueError):
        D.process_invariant_pad("nope", 4096)


def test_multihost_pad_to_makes_shapes_process_invariant():
    """Variable-length modes under a multi-host stripe: each process collates
    a DIFFERENT subset of samples, so batch-local max padding diverges across
    processes (mismatched compiled programs -> hung collectives). pad_to pins
    every process to the same target (ADVICE r04, train/data.py)."""

    def mk(shard, pad_to):
        return D.DataPipeline(
            D.DummyDataset(num_samples=16, seed=11, min_length=64, max_length=256),
            2,
            bucket=64,
            shard=shard,
            pad_to=pad_to,
        )

    # without pad_to the two stripes' padded lengths diverge somewhere
    p0, p1 = mk((0, 2), None), mk((1, 2), None)
    lens0 = [next(p0)[0].shape[-1] for _ in range(4)]
    lens1 = [next(p1)[0].shape[-1] for _ in range(4)]
    assert lens0 != lens1, "dummy lengths happened to match; pick a different seed"

    pad = D.process_invariant_pad("dummy", 128)  # dummy cap = 2x segment_length
    p0, p1 = mk((0, 2), pad), mk((1, 2), pad)
    for _ in range(4):
        b0, b1 = next(p0), next(p1)
        assert b0[0].shape == b1[0].shape == (2, 6, 256)
        assert b0[1].shape == b1[1].shape == (2, 96, 256)


def test_data_state_shard_layout_mismatch_raises(tmp_path):
    """Resuming under a different process count must fail loudly, not
    silently restart ranks at epoch 0 (ADVICE r04, train/loop.py)."""
    from osufusion_tpu.train.loop import load_data_state, save_data_state

    pipe = D.DataPipeline(
        D.DummyDataset(num_samples=6, seed=7, min_length=64, max_length=128), 2, bucket=64, shard=(0, 2)
    )
    next(pipe)
    save_data_state(tmp_path, step=10, pipeline=pipe)

    # matching layout: resumes
    st = load_data_state(tmp_path, current_step=10, shard=(0, 2))
    assert st == pipe.state()
    # saved as 1-of-2, resumed single-process: loud failure
    with pytest.raises(RuntimeError, match="process count"):
        load_data_state(tmp_path, current_step=10, shard=(0, 1))
    # a rank whose file is missing in a multi-process nonzero-step resume
    with pytest.raises(RuntimeError, match="no data-state file"):
        load_data_state(tmp_path / "empty", current_step=10, shard=(1, 2))
    # single-process missing file stays a soft fresh start
    assert load_data_state(tmp_path / "empty", current_step=10, shard=(0, 1)) is None
    # step mismatch stays a soft fresh data order (same on every rank)
    assert load_data_state(tmp_path, current_step=11, shard=(0, 2)) is None


def test_segment_sr_changes_crop_conditioning(tmp_path):
    """segment_sr=True through the actual dataset path: the crop's SR channel
    is recomputed (reference dataset.py:75 defaults it ON)."""
    from osufusion_tpu.audio.constants import frame_times, normalize_context
    from osufusion_tpu.codec.encode import encode_beatmap
    from osufusion_tpu.osu import Beatmap
    from tests.helpers import write_synthetic_map

    bm = Beatmap(write_synthetic_map(tmp_path))
    x = encode_beatmap(bm, frame_times(1600))
    c = normalize_context(np.array([4.0, 8.0, 6.0, 5.0, 9.9], dtype=np.float32))
    np.savez_compressed(tmp_path / "spec.npz", a=np.full((96, 1600), -10, np.float32))
    np.savez_compressed(tmp_path / "m.map.npz", x=x, c=c, spec_path="spec.npz")

    def first_context(segment_sr):
        ds = D.make_dataset(
            "subsequence", [tmp_path / "m.map.npz"], seed=0, segment_length=1024, segment_sr=segment_sr
        )
        ds.flip_horizontal_prob = ds.flip_vertical_prob = 0.0
        return next(iter(ds))[2]

    c_plain = first_context(False)
    c_rated = first_context(True)
    np.testing.assert_allclose(c_rated[:4], c_plain[:4], atol=1e-5)
    assert c_rated[4] != c_plain[4], "segment_sr did not re-rate the crop"


def test_fp16_train_step():
    """--mixed-precision fp16 parity surface (reference trainer.py:210): one
    step on the tiny config in float16 activations produces a finite loss."""
    import dataclasses

    cfg = tiny_config(mixed_precision="fp16")
    model = build_model(dataclasses.replace(TINY_MODEL, dtype="float16"), cfg.diffusion)
    mesh = make_mesh(data=8, model=1)
    state = init_state(model, cfg, jax.random.PRNGKey(0), seq_len=64)
    state, _ = shard_state(state, mesh)
    step = make_train_step(model, cfg, mesh)
    state, metrics = step(state, np_batch())
    assert np.isfinite(float(metrics["loss"]))


def test_fp8_train_step():
    """--mixed-precision fp8 parity surface (reference trainer.py:210, MS-AMP
    O1): the big Dense dots run on dynamically-scaled e4m3 operands with a
    straight-through bf16 backward (ops/quant.py); one step trains to a
    finite loss and the quantized forward stays close to the exact one."""
    import dataclasses

    from osufusion_tpu.ops.quant import set_quantization

    cfg = tiny_config()
    model_cfg = dataclasses.replace(TINY_MODEL, dtype="bfloat16", quant="fp8")
    model = build_model(model_cfg, cfg.diffusion)  # sets quantization mode
    try:
        mesh = make_mesh(data=8, model=1)
        state = init_state(model, cfg, jax.random.PRNGKey(0), seq_len=64)
        state, _ = shard_state(state, mesh)
        step = make_train_step(model, cfg, mesh)
        state, metrics = step(state, np_batch())
        assert np.isfinite(float(metrics["loss"]))
    finally:
        set_quantization("none")


def test_fp8_dot_close_to_exact():
    """Per-tensor e4m3 scaling keeps the quantized dense dot within fp8-level
    relative error, and its straight-through gradients match the exact dot."""
    from osufusion_tpu.ops.quant import quantized_dot_general, set_quantization

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (4, 32, 64)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.05, (64, 48)), jnp.float32)
    dn = (((2,), (0,)), ((), ()))

    exact = jax.lax.dot_general(x, w, dn)
    set_quantization("fp8")
    try:
        quant = quantized_dot_general(x, w, dn)
        err = float(jnp.max(jnp.abs(quant - exact)) / jnp.max(jnp.abs(exact)))
        assert err < 0.1, f"fp8 dot error too large: {err}"

        g_exact = jax.grad(lambda x, w: (jax.lax.dot_general(x, w, dn) * 0.01).sum(), (0, 1))(x, w)
        g_quant = jax.grad(lambda x, w: (quantized_dot_general(x, w, dn) * 0.01).sum(), (0, 1))(x, w)
        for ge, gq in zip(g_exact, g_quant):
            np.testing.assert_allclose(np.asarray(gq), np.asarray(ge), atol=1e-5, rtol=1e-5)
    finally:
        set_quantization("none")


def test_zero1_opt_state_sharding():
    """Optimizer moments shard over the data axis (ZeRO-1) while params stay
    per the TP rules; one step runs and updates correctly on the mesh."""
    cfg = tiny_config(batch_size=8)
    model = build_model(cfg.model, cfg.diffusion)
    mesh = make_mesh(data=8, model=1)
    state = init_state(model, cfg, jax.random.PRNGKey(0), seq_len=64)
    state, shardings = shard_state(state, mesh, shard_opt_state=True)

    specs = [s.spec for s in jax.tree.leaves(shardings.opt_state) if hasattr(s, "spec")]
    assert any(any(ax == "data" for ax in spec if ax) for spec in specs if spec)

    step = make_train_step(model, cfg, mesh)
    state, metrics = step(state, np_batch())
    assert np.isfinite(float(metrics["loss"]))


# ------------------------------------------------------- trainer sampling hook


def test_sample_step_pads_to_flash_tileable_length(tmp_path, monkeypatch):
    """The trainer's periodic sampling hook (reference trainer.py:98-140) must
    pad real song lengths to the serving path's LENGTH_BUCKET so every UNet
    level stays on the flash-attention tiling: an unpadded 22553-frame song
    would fall to the O(T^2) XLA fallback, which cannot fit a v5e.

    Two parts: (1) the production bucket is tileable at every level of the
    4-deep production UNet; (2) sample_step end-to-end on a deliberately
    non-64-divisible wav completes on CPU with a (monkeypatched) small bucket
    and writes the sample image.
    """
    from scipy.io import wavfile

    import osufusion_tpu.serve.generate as G
    from osufusion_tpu.audio.constants import HOP_LENGTH, SR
    from osufusion_tpu.ops.pallas_attention import flash_attention_available
    from osufusion_tpu.utils.logging import MetricLogger
    from trainer import sample_step

    # (1) production bucket tiles at every UNet level (depths 0..3, heads 16)
    for level in range(4):
        t = G.LENGTH_BUCKET // (2**level)
        assert flash_attention_available(t, t, 64, 16, 1), f"bucket untileable at level {level}"

    # (2) end-to-end through a real (non-divisible) wav on the tiny model
    n_seconds = 1.7
    tone = np.sin(2 * np.pi * 440 * np.arange(int(SR * n_seconds)) / SR).astype(np.float32)
    wav = tmp_path / "song.wav"
    wavfile.write(wav, SR, (tone * 32767).astype(np.int16))
    n_frames = int(SR * n_seconds) // HOP_LENGTH + 1
    assert n_frames % 64 != 0, "pick a length that is NOT 64-divisible"

    monkeypatch.setattr(G, "LENGTH_BUCKET", 128)

    from osufusion_tpu.config import DiffusionConfig
    from osufusion_tpu.train.loop import init_state

    cfg = tiny_config()
    cfg = Config(
        model=cfg.model,
        diffusion=DiffusionConfig(sampling_timesteps=2, cfg_scale=2.0),
        train=cfg.train,
    )
    model = build_model(cfg.model, cfg.diffusion)
    state = init_state(model, cfg, jax.random.PRNGKey(0), seq_len=64)
    logger = MetricLogger(tmp_path)
    sample_step(model, state.params, wav, tmp_path, logger, step=7, cfg=cfg)
    logger.close()
    assert (tmp_path / "sample_7.png").exists()


def test_sample_step_from_sharded_3d_mesh_state(tmp_path, monkeypatch):
    """The trainer's periodic sampling hook must survive a 3-D
    data x seq x model training mesh: params are TP-sharded, optimizer
    moments ZeRO-sharded, and the ambient seq mesh routes attention through
    the ring kernels during training. The hook's contract (trainer.py):
    ``replicate_params`` gathers whole tensors (a collective), then
    ``sample_step`` renders from them. Reference analog: periodic sampling
    during distributed training (reference trainer.py:98-140)."""
    import dataclasses

    from jax.experimental.pallas import tpu as pltpu
    from scipy.io import wavfile

    import osufusion_tpu.serve.generate as G
    from osufusion_tpu.audio.constants import SR
    from osufusion_tpu.train.loop import replicate_params
    from osufusion_tpu.utils.logging import MetricLogger
    from trainer import sample_step

    # dim_head=64 (sharded-kernel lane width); ctx = T so the global sites
    # take the RING path during the train step (same recipe as dryrun leg 3)
    model_cfg = dataclasses.replace(
        TINY_MODEL, attn_dim_head=64, attn_heads=2, attn_context_len=256
    )
    cfg = Config(
        model=model_cfg,
        diffusion=DiffusionConfig(sampling_timesteps=2, cfg_scale=2.0),
        train=TrainConfig(
            total_steps=1, warmup_steps=1, lr=1e-3, batch_size=2,
            mesh_data=2, mesh_seq=2, mesh_model=2,
        ),
    )
    mesh = make_mesh(data=2, seq=2, model=2)
    model = build_model(cfg.model, cfg.diffusion)
    with pltpu.force_tpu_interpret_mode():
        state = init_state(model, cfg, jax.random.PRNGKey(0), seq_len=64)
        state, state_sh = shard_state(state, mesh)
        step = make_train_step(model, cfg, mesh, state_shardings=state_sh)
        state, metrics = step(state, np_batch(B=2, N=256))
    assert np.isfinite(float(metrics["loss"]))
    # params really are TP-sharded before the gather
    q_kernels = [
        v for kp, v in jax.tree_util.tree_flatten_with_path(state.params)[0]
        if "to_q" in "/".join(str(getattr(k, "key", k)) for k in kp)
    ]
    assert any("model" in str(k.sharding.spec) for k in q_kernels)

    tone = np.sin(2 * np.pi * 440 * np.arange(int(SR * 1.7)) / SR).astype(np.float32)
    wav = tmp_path / "song.wav"
    wavfile.write(wav, SR, (tone * 32767).astype(np.int16))
    monkeypatch.setattr(G, "LENGTH_BUCKET", 128)

    sample_params = replicate_params(state.params, mesh)
    logger = MetricLogger(tmp_path)
    sample_step(model, sample_params, wav, tmp_path, logger, step=3, cfg=cfg)
    logger.close()
    assert (tmp_path / "sample_3.png").exists()


def test_fp8_conv_dot_matches_exact():
    """fp8_conv1d_dot (MS-AMP O1 quantizes conv GEMMs too): forward within
    fp8-level error of the exact shifted-matmul conv; backward is the exact
    straight-through gradient."""
    from osufusion_tpu.nn.conv import conv1d_matmul
    from osufusion_tpu.ops.quant import fp8_conv1d_dot

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (2, 32, 64)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.05, (3, 64, 48)), jnp.float32)
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))

    exact = conv1d_matmul(x, w, 1, 1)
    quant = fp8_conv1d_dot(xp, w, 32, 1, jnp.float32)
    err = float(jnp.max(jnp.abs(quant - exact)) / jnp.max(jnp.abs(exact)))
    assert err < 0.1, f"fp8 conv error too large: {err}"

    g_exact = jax.grad(lambda x, w: (conv1d_matmul(x, w, 1, 1) * 0.01).sum(), (0, 1))(x, w)
    g_quant = jax.grad(
        lambda xp, w: (fp8_conv1d_dot(xp, w, 32, 1, jnp.float32) * 0.01).sum(), (0, 1)
    )(xp, w)
    np.testing.assert_allclose(np.asarray(g_quant[0][:, 1:-1]), np.asarray(g_exact[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(g_quant[1]), np.asarray(g_exact[1]), atol=1e-6)


def test_fp8_mode_quantizes_conv_dots():
    """Trace-level: a MatmulConv built with quant="fp8" emits e4m3 converts in
    its jaxpr (the conv FLOP majority actually runs quantized), and the fp8
    model's forward differs from the exact model's (the mode is live) while
    staying within fp8-scale error."""
    from osufusion_tpu.nn.conv import MatmulConv

    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (1, 32, 64)), jnp.float32)
    mc_fp8 = MatmulConv(features=48, kernel_size=(3,), padding=1, quant="fp8")
    params = mc_fp8.init(jax.random.PRNGKey(0), x)
    jaxpr = str(jax.make_jaxpr(lambda p, x: mc_fp8.apply(p, x))(params, x))
    assert "f8_e4m3" in jaxpr or "float8_e4m3" in jaxpr, "no e4m3 ops in fp8 MatmulConv trace"

    mc = MatmulConv(features=48, kernel_size=(3,), padding=1)
    y_exact = mc.apply(params, x)
    y_fp8 = mc_fp8.apply(params, x)
    assert not np.array_equal(np.asarray(y_exact), np.asarray(y_fp8))
    err = float(jnp.max(jnp.abs(y_fp8 - y_exact)) / jnp.max(jnp.abs(y_exact)))
    assert err < 0.1

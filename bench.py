"""Benchmark entry point. Prints ONE JSON line:
{"metric", "value", "unit", "vs_baseline", "detail"}.

Default mode (BENCH_MODE=gen): full-song generation latency — 50-step DDIM
with CFG on a 3-minute song at the reference's inference width (dim_h=128),
single chip. Target (BASELINE.md): < 10 s/map; vs_baseline = 10 / latency so
>1.0 beats the target.

BENCH_MODE=train: training-step throughput (steps/s and per-step wall time)
for the bf16 UNet at the given size.

Notes on methodology: this environment reaches the TPU through a network
tunnel with ~25-30 ms round-trip latency and a result cache for repeated
identical calls — timings therefore vary the inputs every call and use a
host read for synchronization.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from osufusion_tpu.utils.cache import enable_compilation_cache


def _peak_flops(device_kind: str) -> float:
    """bf16 peak FLOP/s for the device kind string (default: v5e's 197 TF/s)."""
    table = {"v5 lite": 197e12, "v5e": 197e12, "v5p": 459e12, "v4": 275e12}
    kind = device_kind.lower()
    return next((v for k, v in table.items() if k in kind), 197e12)


def bench_generation() -> dict:
    from osufusion_tpu.audio.constants import SR, HOP_LENGTH
    from osufusion_tpu.config import Config, DiffusionConfig, ModelConfig
    from osufusion_tpu.models import build_model
    from osufusion_tpu.serve.generate import LENGTH_BUCKET

    dim_h = int(os.environ.get("BENCH_DIM_H", 128))
    song_seconds = float(os.environ.get("BENCH_SONG_SECONDS", 180.0))
    steps = int(os.environ.get("BENCH_STEPS", 50))
    cfg_scale = float(os.environ.get("BENCH_CFG", 2.0))
    sampler = os.environ.get("BENCH_SAMPLER", "ddim")  # "dpmpp-2m": same quality at ~16 steps

    n_frames = int(song_seconds * SR / HOP_LENGTH)
    padded = ((n_frames + LENGTH_BUCKET - 1) // LENGTH_BUCKET) * LENGTH_BUCKET

    full_bf16 = os.environ.get("BENCH_FULL_BF16", "1") == "1"
    cfg = Config(
        model=ModelConfig(
            dim_h=dim_h, dtype="bfloat16", param_dtype="bfloat16" if full_bf16 else "float32"
        ),
        diffusion=DiffusionConfig(),
    )
    model = build_model(cfg.model, cfg.diffusion)
    params = model.init_params(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(-10, 3, (1, 96, padded)).astype(np.float32))
    c = jnp.asarray(rng.uniform(-1, 1, (1, 5)).astype(np.float32))

    # AOT split so the artifact separates host-side tracing (pure Python,
    # unavoidable per process) from XLA compile — the persistent compilation
    # cache (utils/cache.py) serves the latter cross-process on the TPU
    # backend (verified: a second cold process logs a jit_sample cache hit
    # and compile_s collapses to blob-deserialize time).
    #
    # BENCH_AOT=1 goes further (serve/aot.py): the traced program itself is
    # serialized to disk, so a process that finds the artifact pays NO
    # Python tracing at all — trace_s becomes deserialize time. Run twice
    # (fresh OSUFUSION_AOT_DIR) for the cold/warm pair; the second process's
    # trace_s + compile_s + warmup_s is the serving time-to-first-map.
    x0_warm = jax.random.normal(jax.random.PRNGKey(0), (1, 6, padded))
    if os.environ.get("BENCH_AOT", "0") == "1":
        from osufusion_tpu.serve.aot import load_or_export_sampler, load_sampler

        t0 = time.perf_counter()
        run_aot = load_sampler(model, a.shape, steps, sampler, cfg_scale)
        had_artifact = run_aot is not None
        if run_aot is None:
            run_aot = load_or_export_sampler(model, params, a.shape, steps, sampler, cfg_scale)
        trace_s = time.perf_counter() - t0  # export (cold) or deserialize (warm)
        # Drain the (async) param upload before timing the first execute:
        # on this tunneled host the first call otherwise absorbs a variable
        # mix of pending transfers and remote-server teardown from a previous
        # process (measured 20-317 s for the identical program). upload_s
        # reports the drain so the components stay separable; the executable
        # path itself never compiles (compile_s stays 0).
        t0 = time.perf_counter()
        params = jax.block_until_ready(jax.device_put(params, jax.devices()[0]))
        jax.block_until_ready((a, c))
        upload_s = time.perf_counter() - t0
        compile_s = 0.0
        compiled = None

        def run(seed: int) -> np.ndarray:
            x0 = jax.random.normal(jax.random.PRNGKey(seed), (1, 6, padded))
            return np.asarray(run_aot(params, a, c, x0))
    else:
        had_artifact = None
        upload_s = None
        t0 = time.perf_counter()
        # the jit wrapper is a class attribute (static self): bind explicitly
        lowered = type(model).sample.lower(
            model, params, a, c, x=x0_warm, cond_scale=cfg_scale, sampling_timesteps=steps, method=sampler
        )
        trace_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        compiled = lowered.compile()
        compile_s = time.perf_counter() - t0

        def run(seed: int) -> np.ndarray:
            x0 = jax.random.normal(jax.random.PRNGKey(seed), (1, 6, padded))
            out = compiled(params, a, c, x=x0)
            return np.asarray(out)  # host read = sync

    t0 = time.perf_counter()
    run(0)  # warmup (device upload of params + first execute)
    warmup_s = time.perf_counter() - t0

    times = []
    for seed in range(1, 3):
        t0 = time.perf_counter()
        out = run(seed)
        times.append(time.perf_counter() - t0)
    latency = min(times)
    assert np.isfinite(out).all()

    return {
        "metric": "fullsong_gen_latency_ddim50_cfg" if sampler == "ddim" else f"fullsong_gen_latency_{sampler}{steps}_cfg",
        "value": round(latency, 3),
        "unit": "s/map",
        "vs_baseline": round(10.0 / latency, 3),
        "detail": {
            "song_seconds": song_seconds,
            "frames": padded,
            "dim_h": dim_h,
            "steps": steps,
            "sampler": sampler,
            "cfg_scale": cfg_scale,
            "trace_s": round(trace_s, 1),
            "compile_s": round(compile_s, 1),
            "warmup_s": round(warmup_s, 1),
            **({"upload_s": round(upload_s, 1)} if upload_s is not None else {}),
            **({"had_artifact": had_artifact} if had_artifact is not None else {}),
            "device": jax.devices()[0].device_kind,
        },
    }


def bench_train() -> dict:
    from osufusion_tpu.config import Config, DiffusionConfig, ModelConfig, TrainConfig
    from osufusion_tpu.models import build_model
    from osufusion_tpu.parallel import make_mesh
    from osufusion_tpu.train.loop import init_state, make_train_step, shard_state

    # defaults = the production config the MFU target is defined on
    # (BASELINE.md: dim_h 512, B 4, T 4096, full-bf16, one v5e). remat
    # defaults to "resnet": the resnet recompute is elementwise/conv chains
    # that stay inside fused XLA kernels, so rematting them REMOVES the
    # GroupNorm/FiLM/SiLU save/reload HBM round-trips — measured 0.368 s/step
    # (41.2% strict MFU) vs save-attn 0.395 s and no-remat 0.378 s (which
    # sits within ~1% of the 15.75 GB HBM limit, OOMing on compiler mood).
    dim_h = int(os.environ.get("BENCH_DIM_H", 512))
    batch = int(os.environ.get("BENCH_BATCH", 4))
    seq = int(os.environ.get("BENCH_SEQ", 4096))
    steps = int(os.environ.get("BENCH_STEPS", 10))
    # BENCH_BACKBONE=dit|mmdit benches the transformer backbones (CLI-trainable
    # since round 3; MFU accounting via utils/flops.py model_fwd_flops)
    backbone = os.environ.get("BENCH_BACKBONE", "unet")
    depth = int(os.environ.get("BENCH_DEPTH", 12))

    full_bf16 = os.environ.get("BENCH_FULL_BF16", "1") == "1"
    remat = os.environ.get("BENCH_REMAT", "1") == "1"
    remat_mode = os.environ.get("BENCH_REMAT_MODE", "resnet")
    extra = {}
    if os.environ.get("BENCH_REMAT_LEVELS"):
        extra["remat_level_modes"] = tuple(os.environ["BENCH_REMAT_LEVELS"].split(","))
    if backbone in ("dit", "mmdit"):
        # DiT/MMDiT attention feeds the residual stream unprojected:
        # heads * dim_head must equal dim_h (nn/dit.py)
        extra = dict(attn_heads=dim_h // 64, attn_dim_head=64, depth=depth)
        if backbone == "mmdit":
            extra["attn_kv_heads"] = 2
    cfg = Config(
        model=ModelConfig(
            dim_h=dim_h,
            backbone=backbone,
            dtype="bfloat16",
            param_dtype="bfloat16" if full_bf16 else "float32",
            remat=remat,
            remat_mode=remat_mode,
            **extra,
        ),
        diffusion=DiffusionConfig(),
        train=TrainConfig(
            batch_size=batch, total_steps=10**6, warmup_steps=1000, lr=1e-5, full_bf16=full_bf16
        ),
    )
    mesh = make_mesh(data=1, model=1)
    model = build_model(cfg.model, cfg.diffusion)
    state = init_state(model, cfg, jax.random.PRNGKey(0))
    state, _ = shard_state(state, mesh)
    step_fn = make_train_step(model, cfg, mesh)

    rng = jax.random.PRNGKey(1)
    kx, ka, kc = jax.random.split(rng, 3)
    batch_data = jax.device_put(
        (
            jax.random.uniform(kx, (batch, 6, seq), minval=-1, maxval=1),
            jax.random.normal(ka, (batch, 96, seq)) - 10.0,
            jax.random.uniform(kc, (batch, 5), minval=-1, maxval=1),
            jnp.full((batch,), seq, dtype=jnp.int32),
        )
    )

    t0 = time.perf_counter()
    state, metrics = step_fn(state, batch_data)
    _ = float(metrics["loss"])
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(steps):
        # donated state changes every call: no result-cache aliasing
        state, metrics = step_fn(state, batch_data)
    _ = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / steps

    from osufusion_tpu.utils.flops import model_fwd_flops, train_step_flops

    # Strict MFU: model FLOPs only (fwd + bwd = 3x fwd). Remat recompute is
    # overhead the config chose, NOT useful work — it goes in HFU, never MFU.
    model_flops = 3.0 * model_fwd_flops(cfg.model, batch, seq)
    executed_flops = train_step_flops(
        cfg.model, batch, seq, remat=cfg.model.remat, remat_mode=cfg.model.remat_mode
    )
    peak = _peak_flops(jax.devices()[0].device_kind)
    mfu = model_flops / dt / peak * 100.0
    hfu = executed_flops / dt / peak * 100.0
    return {
        "metric": "train_step_mfu_bf16" if backbone == "unet" else f"train_step_mfu_bf16_{backbone}",
        "value": round(mfu, 2),
        "unit": "percent_of_peak",
        "vs_baseline": round(mfu / 40.0, 3),
        "detail": {
            "s_per_step": round(dt, 4),
            "steps_per_sec": round(1.0 / dt, 3),
            "hfu": round(hfu, 2),
            "model_flops_per_step": model_flops,
            "executed_flops_per_step": executed_flops,
            "dim_h": dim_h,
            "backbone": backbone,
            "batch": batch,
            "seq": seq,
            "compile_s": round(compile_s, 1),
            "device": jax.devices()[0].device_kind,
        },
    }


def bench_fullsong_train() -> dict:
    """One production-width train step at the FullSequenceDataset cap.

    The reference's FullSequenceDataset trains on whole maps up to 65536
    frames (ref osu_fusion/library/dataset.py:134-143); nothing bounds it to
    the 4096-crop config the MFU bench uses. This mode measures that story on
    one chip: dim_h=512, B=1, T=65536, windowed attention engaging beyond the
    trained context (our documented long-sequence semantic), remat "block"
    (the smallest-memory mode — at 65k frames the per-level hidden states are
    16x the production bench's, so saving attention residuals is a luxury).
    On OOM it emits a JSON artifact recording the failure point instead of a
    traceback, per VERDICT round-2 item 6.
    """
    from osufusion_tpu.config import Config, DiffusionConfig, ModelConfig, TrainConfig
    from osufusion_tpu.models import build_model
    from osufusion_tpu.parallel import make_mesh
    from osufusion_tpu.train.loop import init_state, make_train_step, shard_state

    dim_h = int(os.environ.get("BENCH_DIM_H", 512))
    batch = int(os.environ.get("BENCH_BATCH", 1))
    seq = int(os.environ.get("BENCH_SEQ", 65536))
    steps = int(os.environ.get("BENCH_STEPS", 5))
    remat_mode = os.environ.get("BENCH_REMAT_MODE", "block")
    # BENCH_REMAT_MODE=mixed + BENCH_REMAT_LEVELS="save-attn-out,block,block,block"
    # selects per-width-level modes (the full-song policy; config.py)
    extra = {}
    if os.environ.get("BENCH_REMAT_LEVELS"):
        extra["remat_level_modes"] = tuple(os.environ["BENCH_REMAT_LEVELS"].split(","))
    if os.environ.get("BENCH_AUDIO_REMAT"):
        extra["audio_remat_mode"] = os.environ["BENCH_AUDIO_REMAT"]

    cfg = Config(
        model=ModelConfig(
            dim_h=dim_h,
            dtype="bfloat16",
            param_dtype="bfloat16",
            remat=True,
            remat_mode=remat_mode,
            **extra,
        ),
        diffusion=DiffusionConfig(),
        train=TrainConfig(
            batch_size=batch,
            total_steps=10**6,
            warmup_steps=1000,
            lr=1e-5,
            full_bf16=True,
            opt_moments=os.environ.get("BENCH_MOMENTS", "dtype"),
        ),
    )
    detail: dict = {
        "dim_h": dim_h,
        "batch": batch,
        "seq": seq,
        "remat_mode": remat_mode,
        **({"opt_moments": cfg.train.opt_moments} if cfg.train.opt_moments != "dtype" else {}),
        **({"remat_level_modes": list(cfg.model.remat_level_modes)} if remat_mode == "mixed" else {}),
        **({"audio_remat_mode": cfg.model.audio_remat_mode} if cfg.model.audio_remat_mode else {}),
        "device": jax.devices()[0].device_kind,
    }

    def hbm() -> dict:
        stats = jax.local_devices()[0].memory_stats() or {}
        return {
            k: stats[k]
            for k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")
            if k in stats
        }

    try:
        mesh = make_mesh(data=1, model=1)
        model = build_model(cfg.model, cfg.diffusion)
        state = init_state(model, cfg, jax.random.PRNGKey(0))
        state, _ = shard_state(state, mesh)
        step_fn = make_train_step(model, cfg, mesh)

        kx, ka, kc = jax.random.split(jax.random.PRNGKey(1), 3)
        batch_data = jax.device_put(
            (
                jax.random.uniform(kx, (batch, 6, seq), minval=-1, maxval=1),
                jax.random.normal(ka, (batch, 96, seq)) - 10.0,
                jax.random.uniform(kc, (batch, 5), minval=-1, maxval=1),
                jnp.full((batch,), seq, dtype=jnp.int32),
            )
        )

        # AOT lower/compile: memory_analysis() gives the compiler's true HBM
        # picture (memory_stats() is empty on the tunneled axon backend)
        t0 = time.perf_counter()
        compiled = step_fn.lower(state, batch_data).compile()
        detail["compile_s"] = round(time.perf_counter() - t0, 1)
        try:
            ma = compiled.memory_analysis()
            detail["hbm"] = {
                "temp_bytes": int(ma.temp_size_in_bytes),
                "argument_bytes": int(ma.argument_size_in_bytes),
                "output_bytes": int(ma.output_size_in_bytes),
                "alias_bytes": int(ma.alias_size_in_bytes),
            }
        except Exception:
            pass

        state, metrics = compiled(state, batch_data)
        _ = float(metrics["loss"])

        t0 = time.perf_counter()
        for _ in range(steps):
            state, metrics = compiled(state, batch_data)
        _ = float(metrics["loss"])
        dt = (time.perf_counter() - t0) / steps
    except Exception as e:  # document the OOM point rather than crash
        msg = str(e)
        # surface the OOM accounting if present (it sits deep in the
        # compile-helper error text, past generic HTTP wrapping)
        marker = msg.find("Ran out of memory")
        detail["error"] = f"{type(e).__name__}: " + (
            msg[marker : marker + 600] if marker != -1 else msg[:400]
        )
        detail["hbm"] = hbm()
        return {
            "metric": "fullsong_train_step",
            "value": -1,
            "unit": "s/step",
            "vs_baseline": 0.0,
            "detail": detail,
        }

    from osufusion_tpu.utils.flops import model_fwd_flops, train_step_flops

    model_flops = 3.0 * model_fwd_flops(cfg.model, batch, seq)
    executed_flops = train_step_flops(
        cfg.model, batch, seq, remat=cfg.model.remat, remat_mode=cfg.model.remat_mode
    )
    peak = _peak_flops(detail["device"])
    detail.update(
        {
            "steps_per_sec": round(1.0 / dt, 4),
            "mfu": round(model_flops / dt / peak * 100.0, 2),
            "hfu": round(executed_flops / dt / peak * 100.0, 2),
            "model_flops_per_step": model_flops,
            "hbm": {**detail.get("hbm", {}), **hbm()},
        }
    )
    return {
        "metric": "fullsong_train_step",
        "value": round(dt, 4),
        "unit": "s/step",
        "vs_baseline": round(model_flops / dt / peak / 0.40, 3),
        "detail": detail,
    }


def _synthetic_corpus(root, n_maps: int, frames: int) -> list:
    """A real-format .map.npz corpus: each x is an ENCODED synthetic beatmap
    (so segment-SR's per-crop decode + difficulty runs on genuine structure,
    not noise), a is a log-VQT-floored spectrogram, both savez_compressed
    exactly like train/preprocess.py writes them."""
    from pathlib import Path

    from osufusion_tpu.audio.constants import frame_times, normalize_context
    from osufusion_tpu.codec.encode import encode_beatmap
    from osufusion_tpu.osu.beatmap import Beatmap

    root = Path(root)
    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    ft = frame_times(frames)
    song_ms = frames * 8
    paths = []
    for m in range(n_maps):
        # ~3 objects/second with jitter: a dense, rateable map
        lines = []
        t = 1000
        i = 0
        while t < song_ms - 1000:
            x_pos = 100 + (i * 37) % 300
            y_pos = 100 + (i * 53) % 200
            if i % 7 == 3:
                lines.append(f"{x_pos},{y_pos},{t},2,0,L|{x_pos + 80}:{y_pos},1,70")
            else:
                lines.append(f"{x_pos},{y_pos},{t},{5 if i % 8 == 0 else 1},0,0:0:0:0:")
            t += 250 + int(rng.integers(0, 150))
            i += 1
        text = (
            "osu file format v14\n\n[General]\nAudioFilename: audio.mp3\nMode: 0\n\n"
            "[Metadata]\nTitle: Bench\nArtist: Bench\nCreator: bench\nVersion: v\n\n"
            "[Difficulty]\nHPDrainRate: 5\nCircleSize: 4\nOverallDifficulty: 6\n"
            "ApproachRate: 8\nSliderMultiplier: 1.4\nSliderTickRate: 1\n\n"
            "[TimingPoints]\n1000,400,4,1,0,50,1,0\n\n[HitObjects]\n" + "\n".join(lines) + "\n"
        )
        osu_path = root / f"m{m}.osu"
        osu_path.write_text(text, encoding="utf-8")
        bm = Beatmap(osu_path)
        x = encode_beatmap(bm, ft)
        a = (rng.normal(-16, 4, (96, frames))).astype(np.float32)
        c = normalize_context(np.array([4.0, 8.0, 6.0, 5.0, 3.0 + m % 5], np.float32))
        spec_name = f"m{m}.spec.npz"
        # the production spec format (train/preprocess.py): f16, uncompressed
        np.savez(root / spec_name, a=a.astype(np.float16))
        map_path = root / f"m{m}.map.npz"
        np.savez_compressed(map_path, x=x.astype(np.float32), c=c, spec_path=spec_name)
        paths.append(map_path)
    return paths


def bench_data() -> dict:
    """Input-pipeline feed rate vs the TPU's measured consumption rate.

    The reference's DataLoader feeds its trainer with per-crop star-rating
    recompute ON by default (ref trainer.py:254-262, library/dataset.py:40-75)
    — SURVEY section 7 "hard parts" #4 flags exactly this as the starvation
    risk on the training hot path. This mode measures DataPipeline
    samples/s on a real-format corpus with segment-SR ON and OFF, and
    compares against the production step's consumption (BENCH_CONSUMED_SPS
    env, default the round-5 measured 2.813 steps/s x batch 4)."""
    import tempfile

    n_maps = int(os.environ.get("BENCH_DATA_MAPS", 32))
    frames = int(os.environ.get("BENCH_DATA_FRAMES", 8192))
    segment = int(os.environ.get("BENCH_SEGMENT", 4096))
    batch = int(os.environ.get("BENCH_BATCH", 4))
    workers = int(os.environ.get("BENCH_DATA_WORKERS", os.cpu_count() or 1))
    n_batches = int(os.environ.get("BENCH_DATA_BATCHES", 24))
    consumed = float(os.environ.get("BENCH_CONSUMED_SPS", 2.813)) * batch

    from osufusion_tpu.train import data as D

    with tempfile.TemporaryDirectory() as tmp:
        t0 = time.perf_counter()
        paths = _synthetic_corpus(tmp, n_maps, frames)
        build_s = time.perf_counter() - t0

        def rate(segment_sr: bool) -> float:
            ds = D.SubsequenceDataset(paths, segment_sr=segment_sr, seed=1, sequence_length=segment)
            pipe = D.DataPipeline(ds, batch, num_workers=workers)
            next(pipe)  # warm the worker pool / page cache
            t0 = time.perf_counter()
            for _ in range(n_batches):
                next(pipe)
            return n_batches * batch / (time.perf_counter() - t0)

        sps_sr = rate(True)
        sps_plain = rate(False)

    return {
        "metric": "data_pipeline_samples_per_sec_segment_sr",
        "value": round(sps_sr, 2),
        "unit": "samples/s",
        # >1.0 = the pipeline outruns the production train step's consumption
        "vs_baseline": round(sps_sr / consumed, 3),
        "detail": {
            "samples_per_sec_no_sr": round(sps_plain, 2),
            "consumption_samples_per_sec": round(consumed, 2),
            "implied_max_steps_per_sec": round(sps_sr / batch, 3),
            "maps": n_maps,
            "frames_per_map": frames,
            "segment_length": segment,
            "batch": batch,
            "workers": workers,
            "corpus_build_s": round(build_s, 1),
            "host_cpus": os.cpu_count(),
        },
    }


def main() -> None:
    from osufusion_tpu.utils.platform import pin_platform_from_env

    pin_platform_from_env()
    enable_compilation_cache()
    mode = os.environ.get("BENCH_MODE", "gen")
    if mode == "fullsong_train":
        result = bench_fullsong_train()
    elif mode == "data":
        result = bench_data()
    else:
        result = bench_generation() if mode == "gen" else bench_train()
    print(json.dumps(result))


if __name__ == "__main__":
    main()

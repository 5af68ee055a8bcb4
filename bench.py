"""Benchmark: denoiser train-step MFU on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.md): >= 40% MFU for the bf16 training step.
FLOPs come from XLA's own cost analysis of the compiled step; peak is the
chip's bf16 rating (v5e: 197 TFLOP/s).

Env overrides: BENCH_DIM_H, BENCH_BATCH, BENCH_SEQ, BENCH_STEPS.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

PEAK_BF16_TFLOPS = {
    "v5 lite": 197.0,
    "v5e": 197.0,
    "v5p": 459.0,
    "v4": 275.0,
    "v6": 918.0,
}


def chip_peak_tflops() -> float:
    kind = jax.devices()[0].device_kind.lower()
    for key, val in PEAK_BF16_TFLOPS.items():
        if key in kind:
            return val
    return 197.0


def main() -> None:
    from osufusion_tpu.config import Config, DiffusionConfig, ModelConfig, TrainConfig
    from osufusion_tpu.models import build_model
    from osufusion_tpu.parallel import make_mesh
    from osufusion_tpu.train.loop import init_state, make_train_step, shard_state

    dim_h = int(os.environ.get("BENCH_DIM_H", 128))
    batch = int(os.environ.get("BENCH_BATCH", 4))
    seq = int(os.environ.get("BENCH_SEQ", 4096))
    steps = int(os.environ.get("BENCH_STEPS", 10))

    cfg = Config(
        model=ModelConfig(dim_h=dim_h, dtype="bfloat16"),
        diffusion=DiffusionConfig(),
        train=TrainConfig(batch_size=batch, total_steps=10**6, warmup_steps=1000, lr=1e-5),
    )
    mesh = make_mesh(data=1, model=1)
    model = build_model(cfg.model, cfg.diffusion)

    state = init_state(model, cfg, jax.random.PRNGKey(0), seq_len=256)
    state, _ = shard_state(state, mesh)
    step_fn = make_train_step(model, cfg, mesh)

    rng = jax.random.PRNGKey(1)
    kx, ka, kc = jax.random.split(rng, 3)
    batch_data = (
        jax.random.uniform(kx, (batch, 6, seq), minval=-1, maxval=1),
        jax.random.normal(ka, (batch, 96, seq)) - 10.0,
        jax.random.uniform(kc, (batch, 5), minval=-1, maxval=1),
        jnp.full((batch,), seq, dtype=jnp.int32),
    )
    batch_data = jax.device_put(batch_data)

    # compile + FLOP count
    lowered = step_fn.lower(state, batch_data)
    compiled = lowered.compile()
    flops = None
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) or None
    except Exception:
        flops = None

    # warmup (donated state: keep threading it through)
    state, metrics = step_fn(state, batch_data)
    jax.block_until_ready(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step_fn(state, batch_data)
    jax.block_until_ready(metrics["loss"])
    dt = (time.perf_counter() - t0) / steps

    steps_per_sec = 1.0 / dt
    if flops:
        mfu = flops / dt / (chip_peak_tflops() * 1e12) * 100.0
        print(
            json.dumps(
                {
                    "metric": "train_step_mfu_bf16",
                    "value": round(mfu, 2),
                    "unit": "percent_of_peak",
                    "vs_baseline": round(mfu / 40.0, 3),
                    "detail": {
                        "steps_per_sec": round(steps_per_sec, 3),
                        "dim_h": dim_h,
                        "batch": batch,
                        "seq": seq,
                        "flops_per_step": flops,
                        "device": jax.devices()[0].device_kind,
                    },
                }
            )
        )
    else:
        print(
            json.dumps(
                {
                    "metric": "train_steps_per_sec",
                    "value": round(steps_per_sec, 3),
                    "unit": "steps/s",
                    "vs_baseline": 1.0,
                    "detail": {"dim_h": dim_h, "batch": batch, "seq": seq},
                }
            )
        )


if __name__ == "__main__":
    main()

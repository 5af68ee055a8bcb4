"""Capture an op-level device trace of the production train step and print a
time-aggregated op table.

Runs a few steps of the bench_train workload under ``jax.profiler.trace``,
then parses the emitted Chrome trace (trace.json.gz) and aggregates TensorCore
op durations by fusion/op name — the round-over-round tool for deciding where
the step time actually goes (CLAUDE.md "Perf state").

Usage:  python scripts/train_trace.py [--steps 3] [--outdir /tmp/osu_trace]
        BENCH_* env vars are honored like bench.py (BENCH_DIM_H, BENCH_SEQ...).
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
from collections import defaultdict


def capture(outdir: str, steps: int) -> None:
    import jax
    import jax.numpy as jnp

    from osufusion_tpu.config import Config, DiffusionConfig, ModelConfig, TrainConfig
    from osufusion_tpu.models import build_model
    from osufusion_tpu.parallel import make_mesh
    from osufusion_tpu.train.loop import init_state, make_train_step, shard_state
    from osufusion_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    dim_h = int(os.environ.get("BENCH_DIM_H", 512))
    batch = int(os.environ.get("BENCH_BATCH", 4))
    seq = int(os.environ.get("BENCH_SEQ", 4096))
    remat = os.environ.get("BENCH_REMAT", "1") == "1"
    remat_mode = os.environ.get("BENCH_REMAT_MODE", "resnet")
    backbone = os.environ.get("BENCH_BACKBONE", "unet")
    extra = {}
    if backbone in ("dit", "mmdit"):
        extra = dict(attn_heads=dim_h // 64, attn_dim_head=64, depth=int(os.environ.get("BENCH_DEPTH", 12)))
        if backbone == "mmdit":
            extra["attn_kv_heads"] = 2

    cfg = Config(
        model=ModelConfig(
            dim_h=dim_h, backbone=backbone, dtype="bfloat16", param_dtype="bfloat16",
            remat=remat, remat_mode=remat_mode, **extra,
        ),
        diffusion=DiffusionConfig(),
        train=TrainConfig(batch_size=batch, total_steps=10**6, warmup_steps=1000, lr=1e-5, full_bf16=True),
    )
    mesh = make_mesh(data=1, model=1)
    model = build_model(cfg.model, cfg.diffusion)
    state = init_state(model, cfg, jax.random.PRNGKey(0))
    state, _ = shard_state(state, mesh)
    step_fn = make_train_step(model, cfg, mesh)

    kx, ka, kc = jax.random.split(jax.random.PRNGKey(1), 3)
    batch_data = jax.device_put((
        jax.random.uniform(kx, (batch, 6, seq), minval=-1, maxval=1),
        jax.random.normal(ka, (batch, 96, seq)) - 10.0,
        jax.random.uniform(kc, (batch, 5), minval=-1, maxval=1),
        jnp.full((batch,), seq, dtype=jnp.int32),
    ))

    state, metrics = step_fn(state, batch_data)  # compile outside the trace
    _ = float(metrics["loss"])

    jax.profiler.start_trace(outdir)
    for _ in range(steps):
        state, metrics = step_fn(state, batch_data)
    _ = float(metrics["loss"])
    jax.profiler.stop_trace()


CATEGORIES = (
    ("attention", re.compile(r"flash|attn|_fwd_kernel|_bwd|dq|dkv", re.I)),
    ("conv_dot", re.compile(r"dot|conv|einsum", re.I)),
    ("fusion", re.compile(r"fusion", re.I)),
    ("copy", re.compile(r"copy|transpose|reshape|bitcast", re.I)),
)


def analyze(outdir: str, steps: int, top: int) -> None:
    paths = sorted(glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"), recursive=True))
    if not paths:
        raise SystemExit(f"no trace.json.gz under {outdir}")
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device lanes: pid whose process_name mentions TPU / TensorCore
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    device_pids = {p for p, n in names.items() if "TPU" in n or "/device" in n.lower()}
    agg = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        agg[name] += dur
        total += dur
    print(f"# device lanes: {sorted(names[p] for p in device_pids)}")
    print(f"# total device op time: {total:.1f} ms over {steps} steps = {total/steps:.1f} ms/step")
    cats = defaultdict(float)
    for name, dur in agg.items():
        for cat, pat in CATEGORIES:
            if pat.search(name):
                cats[cat] += dur
                break
        else:
            cats["other"] += dur
    for cat, dur in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"{cat:12s} {dur/steps:8.2f} ms/step ({dur/total*100:5.1f}%)")
    print(f"# top {top} ops (ms/step):")
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{dur/steps:9.3f}  {name[:140]}")

    # HLO-level aggregation: group by (hlo_category, name-sans-suffix) with
    # bytes_accessed -> achieved GB/s. This is the table perf decisions read:
    # an entry near HBM peak (~819 GB/s on v5e) is traffic-bound (only
    # cutting bytes helps); far below peak with MXU category = tuning room.
    hlo = defaultdict(lambda: [0.0, 0, 0.0])  # dur_ms, count, bytes
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        n = e.get("name", "")
        if n.startswith("jit_") or n.isdigit():
            continue  # umbrella events double-count their children
        a = e.get("args", {})
        key = (a.get("hlo_category", "?"), re.sub(r"\.\d+$", "", n))
        hlo[key][0] += e.get("dur", 0) / 1e3
        hlo[key][1] += 1
        hlo[key][2] += float(a.get("bytes_accessed", 0))
    print(f"# HLO groups (ms/step, achieved GB/s, calls/step):")
    for (cat, base), (dur, cnt, byts) in sorted(hlo.items(), key=lambda kv: -kv[1][0])[:top]:
        ms = dur / steps
        if ms < 0.05:
            break
        gbs = (byts / steps) / (ms / 1e3) / 1e9 if ms > 0 else 0.0
        print(f"{ms:9.2f}  {gbs:7.0f} GB/s {cnt // steps:6d}/st  {cat} | {base}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--outdir", default="/tmp/osu_trace")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--analyze-only", action="store_true")
    args = ap.parse_args()
    if not args.analyze_only:
        capture(args.outdir, args.steps)
    analyze(args.outdir, args.steps, args.top)


if __name__ == "__main__":
    main()

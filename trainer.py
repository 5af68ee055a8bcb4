"""Pretraining CLI — flag-for-flag parity with the reference ``trainer.py``
(reference trainer.py:364-391), driving the pjit training loop.

Differences from the reference (documented): ``--model-attn-heads`` and
``--model-depth`` are actually wired to the model (they were parsed-but-dead
in the reference, trainer.py:380-381); ``--mesh-model`` adds tensor
parallelism the reference never had; ``--dataset-mode dummy`` replaces the
need for real data in smoke runs.
"""

from __future__ import annotations

import time
from argparse import ArgumentParser
from pathlib import Path

import jax
import numpy as np

from osufusion_tpu.config import Config, DiffusionConfig, ModelConfig, TrainConfig
from osufusion_tpu.models import build_model
from osufusion_tpu.parallel import make_mesh
from osufusion_tpu.parallel.distributed import is_main_process, make_global_batch
from osufusion_tpu.train import data as D
from osufusion_tpu.train.loop import (
    batch_shardings,
    checkpoint_manager,
    init_state,
    load_data_state,
    make_train_step,
    replicate_params,
    restore_checkpoint,
    save_checkpoint,
    save_data_state,
    shard_state,
)
from osufusion_tpu.utils.logging import MetricLogger


def save_model_safetensors(params, path: Path) -> None:
    """Final weight export in safetensors (reference trainer.py:143-145)."""
    from safetensors.numpy import save_file

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    tensors = {
        "/".join(str(getattr(k, "key", k)) for k in kp): np.asarray(v) for kp, v in flat
    }
    save_file(tensors, str(path))


def sample_step(model, params, audio_path: Path, project_dir: Path, logger, step: int, cfg: Config) -> None:
    """Fixed-seed periodic sample rendered to a channel plot
    (reference trainer.py:98-140).

    The audio is padded to a LENGTH_BUCKET multiple exactly as the serving
    path does (serve/generate.py): real song lengths are rarely 64-divisible,
    and an unpadded length would fall off the flash-attention tiling onto the
    O(T^2) XLA fallback — unrunnable at full-song scale.
    """
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    from osufusion_tpu.audio import load_audio, normalize_context
    from osufusion_tpu.serve.generate import LENGTH_BUCKET

    spec = load_audio(audio_path)  # (96, T)
    n = spec.shape[-1]
    padded = ((n + LENGTH_BUCKET - 1) // LENGTH_BUCKET) * LENGTH_BUCKET
    a = np.pad(spec, ((0, 0), (0, padded - n)), constant_values=-23.0)[None]
    c = normalize_context(np.array([4.0, 9.5, 9.5, 4.0, 6.0], dtype=np.float32))[None]

    x0 = jax.random.normal(jax.random.PRNGKey(0), (1, cfg.model.dim_in_x, padded))
    generated = np.asarray(
        model.sample(
            params,
            a,
            c,
            x=x0,
            cond_scale=cfg.diffusion.cfg_scale,
            sampling_timesteps=cfg.diffusion.sampling_timesteps,
        )
    )[..., :n]

    h = generated.shape[1]
    fig, axs = plt.subplots(h, 1, figsize=(max(6, generated.shape[-1] // 150), h * 2), sharex=True)
    for feature, ax in zip(generated[0], np.atleast_1d(axs)):
        ax.plot(feature)
    out = project_dir / f"sample_{step}.png"
    fig.savefig(out)
    plt.close(fig)
    logger.log_image("generated", out, step)


def train(cfg: Config) -> None:
    # multi-host: mesh/devices are GLOBAL, host-side effects are process-0's
    # (reference trainer.py:321 via Accelerate; parallel/distributed.py)
    main = is_main_process()
    n_proc = jax.process_count()
    say = print if main else (lambda *a, **k: None)
    say("Initializing...")
    project_dir = Path(cfg.train.project_dir)
    project_dir.mkdir(parents=True, exist_ok=True)
    if main:
        cfg.save(project_dir / "config.json")

    mesh = make_mesh(cfg.train.mesh_data, cfg.train.mesh_model, cfg.train.mesh_seq)
    say(f"mesh: {dict(mesh.shape)} over {len(mesh.devices.flat)} device(s), {n_proc} process(es)")

    model = build_model(cfg.model, cfg.diffusion)
    state = init_state(model, cfg, jax.random.PRNGKey(cfg.train.seed))
    n_params = sum(p.size for p in jax.tree.leaves(state.params))
    say(f"model: {cfg.diffusion.objective} dim_h={cfg.model.dim_h} ({n_params/1e6:.1f}M params)")
    state, state_sh = shard_state(state, mesh, shard_opt_state=cfg.train.shard_opt_state)
    step_fn = make_train_step(model, cfg, mesh, state_shardings=state_sh)

    mngr = checkpoint_manager(project_dir, cfg.train.max_num_checkpoints)
    if cfg.train.resume is not None:
        state = restore_checkpoint(mngr, state)
        if cfg.train.reset_steps:
            import jax.numpy as jnp

            state = state.replace(step=jnp.zeros((), jnp.int32))
        say(f"resumed at step {int(state.step)}")

    say("Loading dataset...")
    paths = sorted(Path(cfg.train.dataset_dir).rglob("*.map.npz")) if cfg.train.dataset_mode != "dummy" else []
    if cfg.train.max_length > 0 and paths:
        paths = D.filter_dataset(paths, cfg.train.max_length)
    dataset = D.make_dataset(
        cfg.train.dataset_mode,
        paths,
        seed=cfg.train.seed,
        segment_length=cfg.train.segment_length,
        segment_sr=cfg.train.segment_sr,
        sample_density=cfg.train.sample_density,
    )
    accum = cfg.train.gradient_accumulation_steps
    bucket = min(D.BUCKET, max(64, cfg.train.segment_length))
    # cfg.train.batch_size is the GLOBAL batch across the whole mesh; each
    # process materializes only its rows, striding the deterministic position
    # stream by process (reference: Accelerate's per-process DataLoader shard)
    assert cfg.train.batch_size % n_proc == 0, (
        f"global batch {cfg.train.batch_size} not divisible by {n_proc} processes"
    )
    local_bs = cfg.train.batch_size // n_proc
    data_state = (
        load_data_state(project_dir, current_step=int(state.step), shard=(jax.process_index(), n_proc))
        if cfg.train.resume
        else None
    )
    # multi-host: every process must collate the SAME padded length or the
    # compiled programs diverge across hosts (parallel/distributed.py)
    pad_to = (
        D.process_invariant_pad(cfg.train.dataset_mode, cfg.train.segment_length, cfg.train.max_length)
        if n_proc > 1
        else None
    )
    batches = D.DataPipeline(
        dataset,
        local_bs * max(1, accum),
        bucket=bucket,
        num_workers=cfg.train.num_workers,
        start=data_state,
        shard=(jax.process_index(), n_proc),
        pad_to=pad_to,
    )
    b_shardings = batch_shardings(mesh, accum)

    logger = MetricLogger(project_dir, enabled=main)
    losses: list[float] = []
    current_step = int(state.step)

    say("Training...")
    t_last = time.time()
    while current_step < cfg.train.total_steps:
        batch = next(batches)
        if accum > 1:
            x, a, c, ol = batch
            B = local_bs
            batch = (
                x.reshape(accum, B, *x.shape[1:]),
                a.reshape(accum, B, *a.shape[1:]),
                c.reshape(accum, B, *c.shape[1:]),
                ol.reshape(accum, B),
            )
        if n_proc > 1:
            batch = make_global_batch(batch, b_shardings)
        state, metrics = step_fn(state, batch)
        current_step = int(state.step)

        loss = float(metrics["loss"])
        losses.append(loss)
        if len(losses) > max(1, cfg.train.save_every):
            losses.pop(0)
        avg_loss = sum(losses) / len(losses)

        dt = time.time() - t_last
        t_last = time.time()
        say(
            f"step {current_step} loss={loss:.5f} avg={avg_loss:.5f} "
            f"norm={float(metrics['grad_norm']):.4f} lr={float(metrics['lr']):.2e} ({dt:.2f}s)",
            flush=True,
        )
        logger.log(
            {"loss": loss, "total_norm": float(metrics["grad_norm"]), "lr": float(metrics["lr"])},
            step=current_step,
        )

        if cfg.train.save_every > 0 and current_step % cfg.train.save_every == 0:
            logger.log({"save_loss": avg_loss}, step=current_step)
            save_checkpoint(mngr, state)
            save_data_state(project_dir, current_step, batches)

        if (
            cfg.train.sample_every > 0
            and current_step % cfg.train.sample_every == 0
            and cfg.train.sample_audio is not None
            and Path(cfg.train.sample_audio).exists()
        ):
            say("Sampling...")
            # collective param all-gather (EVERY process), then the render is
            # process-0's: sampling sees whole tensors whatever the training
            # mesh (TP/ZeRO/seq sharding) was
            sample_params = replicate_params(state.params, mesh)
            if main:
                sample_step(
                    model, sample_params, Path(cfg.train.sample_audio), project_dir, logger, current_step, cfg
                )

    mngr.wait_until_finished()
    final_params = replicate_params(state.params, mesh) if n_proc > 1 else state.params
    if main:
        save_model_safetensors(final_params, project_dir / "model.safetensors")
    logger.close()
    say("Done.")


def parse_args() -> Config:
    p = ArgumentParser()
    p.add_argument("--project-dir", type=str, default="runs/default")
    p.add_argument("--dataset-dir", type=str, default="data")
    p.add_argument("--model-type", type=str, default="diffusion", choices=["diffusion", "rectified-flow"])
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--reset-steps", action="store_true")
    p.add_argument("--full-sequence", action="store_true")
    p.add_argument("--random-length", action="store_true")
    p.add_argument("--dummy-dataset", action="store_true")
    p.add_argument("--max-length", type=int, default=0)
    p.add_argument("--segment-length", type=int, default=4096)
    p.add_argument(
        "--no-segment-sr",
        action="store_true",
        help="skip per-crop star-rating recompute (reference default is ON, dataset.py:75)",
    )
    p.add_argument("--sample-density", type=float, default=1.0)
    p.add_argument(
        "--mixed-precision", type=str, default="bf16", choices=["no", "fp16", "bf16", "fp8"]
    )
    p.add_argument("--full-bf16", action="store_true")
    p.add_argument(
        "--opt-moments",
        type=str,
        default="dtype",
        choices=["dtype", "int8"],
        help="Adam moment storage: params dtype (exact) or blockwise int8 "
        "(8-bit Adam, ~2.5 GB freed at dim_h=512 — frees HBM for "
        "activation-saving remat at full-song lengths)",
    )
    p.add_argument("--gradient-checkpointing", action="store_true")
    p.add_argument(
        "--gradient-checkpointing-mode",
        choices=["block", "save-attn", "save-attn-out", "ff", "resnet", "resnet-dots", "mixed"],
        default="save-attn",
        help="remat granularity when --gradient-checkpointing is on "
        "(block = max savings, save-attn = keep flash residuals, ff = FFs only, "
        "mixed = per-width-level modes from --gradient-checkpointing-levels)",
    )
    p.add_argument(
        "--gradient-checkpointing-levels",
        type=str,
        default="save-attn-out,block,block,block",
        help='comma-separated per-width-level modes for mode "mixed" '
        "(entry i = UNet width level i, widest first; missing entries repeat "
        "the last) — the full-song T=65536 policy",
    )
    p.add_argument("--gradient-accumulation-steps", type=int, default=1)
    p.add_argument("--clip-grad-norm", type=float, default=0.0)
    p.add_argument("--model-dim", type=int, default=512)
    # the reference builds its DiT/MMDiT backbones but never reaches them from
    # any CLI (SURVEY §2.4 "orphan"); here every backbone is trainable
    p.add_argument("--model-backbone", type=str, default="unet", choices=["unet", "dit", "mmdit"])
    p.add_argument("--model-attn-heads", type=int, default=16)
    p.add_argument("--model-attn-kv-heads", type=int, default=1)
    # transformer-backbone depth (DiT/MMDiT block count; the UNet derives its
    # depth from dim_h_mults) — parsed-but-dead in the reference (trainer.py:381)
    p.add_argument("--model-depth", type=int, default=12)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--num-workers", type=int, default=2)
    p.add_argument("--total-steps", type=int, default=1_000_000)
    p.add_argument("--save-every", type=int, default=1000)
    p.add_argument("--max-num-checkpoints", type=int, default=5)
    p.add_argument("--warmup-steps", type=int, default=1000)
    p.add_argument("--sample-every", type=int, default=1000)
    p.add_argument("--sample-audio", type=str, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--mesh-data", type=int, default=-1)
    p.add_argument("--mesh-model", type=int, default=1)
    p.add_argument("--mesh-seq", type=int, default=1)
    # multi-host launch (reference: `accelerate launch` multi-node args;
    # parallel/distributed.py — also settable via OSUFUSION_* env vars)
    p.add_argument("--coordinator", type=str, default=None, help="host:port of process 0")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    args = p.parse_args()

    if args.dummy_dataset:
        mode = "dummy"
    elif args.full_sequence:
        mode = "full-sequence"
    elif args.random_length:
        mode = "random-length"
    else:
        mode = "subsequence"

    # fp8 = bf16 activations + dynamically-scaled e4m3 dots on the big Dense
    # layers (ops/quant.py) — the TPU analog of the reference's MS-AMP O1
    dtype = {"no": "float32", "fp16": "float16", "bf16": "bfloat16", "fp8": "bfloat16"}[
        args.mixed_precision
    ]
    model = ModelConfig(
        dim_h=args.model_dim,
        backbone=args.model_backbone,
        depth=args.model_depth,
        attn_heads=args.model_attn_heads,
        attn_kv_heads=args.model_attn_kv_heads,
        dtype=dtype,
        quant="fp8" if args.mixed_precision == "fp8" else "none",
        remat=args.gradient_checkpointing,
        remat_mode=args.gradient_checkpointing_mode,
        remat_level_modes=tuple(args.gradient_checkpointing_levels.split(",")),
    )
    diffusion = DiffusionConfig(objective=args.model_type)
    train_cfg = TrainConfig(
        project_dir=args.project_dir,
        dataset_dir=args.dataset_dir,
        model_type=args.model_type,
        resume=args.resume,
        reset_steps=args.reset_steps,
        dataset_mode=mode,
        max_length=args.max_length,
        segment_length=args.segment_length,
        segment_sr=not args.no_segment_sr,
        sample_density=args.sample_density,
        mixed_precision=args.mixed_precision,
        full_bf16=args.full_bf16,
        opt_moments=args.opt_moments,
        gradient_checkpointing=args.gradient_checkpointing,
        gradient_accumulation_steps=args.gradient_accumulation_steps,
        clip_grad_norm=args.clip_grad_norm,
        lr=args.lr,
        batch_size=args.batch_size,
        num_workers=args.num_workers,
        total_steps=args.total_steps,
        save_every=args.save_every,
        max_num_checkpoints=args.max_num_checkpoints,
        warmup_steps=args.warmup_steps,
        sample_every=args.sample_every,
        sample_audio=args.sample_audio,
        seed=args.seed,
        mesh_data=args.mesh_data,
        mesh_model=args.mesh_model,
        mesh_seq=args.mesh_seq,
    )
    cfg = Config(model=model, diffusion=diffusion, train=train_cfg)
    return cfg, (args.coordinator, args.num_processes, args.process_id)


if __name__ == "__main__":
    from osufusion_tpu.parallel.distributed import maybe_initialize
    from osufusion_tpu.utils.cache import enable_compilation_cache
    from osufusion_tpu.utils.platform import pin_platform_from_env

    pin_platform_from_env()
    _cfg, _dist = parse_args()
    maybe_initialize(*_dist)  # before any backend/device use
    enable_compilation_cache()
    train(_cfg)

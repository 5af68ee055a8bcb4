"""LoRA/DoRA fine-tuning CLI — capability parity with the reference
``trainer_peft.py`` (:209-376): load a pretrained model, train only adapter
parameters (r=32, alpha=32, DoRA, attention + residual-conv targets), save
adapter checkpoints under ``loras/`` with an optimizer sidecar, and export a
final ``merged_model.safetensors``.

TPU-native mechanics: adapters are parameter-overlay pytrees applied in weight
space per step (osufusion_tpu/peft/lora.py). The train step is jitted over the
same data x model mesh as pretraining (BASELINE config 5: adapter sharding
across a v5e slice): frozen base params ride their tensor-parallel
NamedShardings and are passed as a step ARGUMENT (a jit closure over 1.28B
params would be re-uploaded per compile), the batch is sharded over ``data``,
adapters are replicated, and the AdamW moments are ZeRO-1 sharded over
``data``. XLA places the adapter-gradient all-reduce on ICI.
"""

from __future__ import annotations

import time
from argparse import ArgumentParser
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from osufusion_tpu.config import Config, DiffusionConfig, ModelConfig, TrainConfig
from osufusion_tpu.models import build_model
from osufusion_tpu.parallel import make_mesh
from osufusion_tpu.parallel.distributed import is_main_process, make_global_batch
from osufusion_tpu.parallel.mesh import host_put, param_shardings, replicated, zero1_shardings
from osufusion_tpu.peft import LoraConfig, apply_lora, count_lora_params, init_lora, merge_lora
from osufusion_tpu.train import data as D
from osufusion_tpu.train.loop import (
    batch_shardings,
    load_data_state,
    make_lr_schedule,
    replicate_params,
    save_data_state,
)
from osufusion_tpu.utils.logging import MetricLogger
from osufusion_tpu.utils.serialization import load_safetensors, save_safetensors


def shard_peft(base_params, adapters, opt_state, mesh: Mesh):
    """Place the PEFT training state on the mesh.

    Base params: tensor-parallel rules (replicated when model=1). Adapters:
    replicated — at r=32 they are ~1% of the model and every data-parallel
    chip needs them each step, so replication beats gathering. Optimizer
    moments: ZeRO-1 over ``data``.
    """
    base_params = host_put(base_params, param_shardings(base_params, mesh))
    rep = replicated(mesh)
    adapters = host_put(adapters, jax.tree.map(lambda _: rep, adapters))
    adapter_struct = jax.tree_util.tree_structure(adapters)

    def handle_opt(node):
        if jax.tree_util.tree_structure(node) == adapter_struct:
            return zero1_shardings(adapters, mesh)
        return jax.tree.map(lambda _: rep, node)

    opt_shardings = jax.tree.map(
        handle_opt, opt_state, is_leaf=lambda n: jax.tree_util.tree_structure(n) == adapter_struct
    )
    opt_state = jax.device_put(opt_state, opt_shardings)
    return base_params, adapters, opt_state


def make_peft_step(model, lora_cfg: LoraConfig, tx, mesh: Mesh, accum: int = 1):
    """Jitted sharded adapter step. With ``accum > 1`` the batch arrives
    stacked (accum, B, ...) and micro-batches scan INSIDE the step, exactly
    like the pretrainer's path (train/loop.py) — one adapter all-reduce per
    optimizer step instead of per micro-batch (reference trainer_peft.py:390
    delegates this to Accelerate)."""

    def loss_fn(adapters, base_params, rng, batch):
        x, a, c, orig_len = batch
        eff = apply_lora(base_params, adapters, lora_cfg)
        return model.loss(eff, rng, x, a, c, orig_len)

    def step(adapters, opt_state, base_params, rng, batch):
        rng, rng_step = jax.random.split(rng)
        if accum <= 1:
            loss, grads = jax.value_and_grad(loss_fn)(adapters, base_params, rng_step, batch)
        else:
            rngs = jax.random.split(rng_step, accum)

            def micro(carry, inp):
                grads_acc, loss_acc = carry
                r, mb = inp
                loss_i, grads_i = jax.value_and_grad(loss_fn)(adapters, base_params, r, mb)
                return (jax.tree.map(jnp.add, grads_acc, grads_i), loss_acc + loss_i), None

            zero = jax.tree.map(jnp.zeros_like, adapters)
            (grads, loss), _ = jax.lax.scan(micro, (zero, 0.0), (rngs, batch))
            grads = jax.tree.map(lambda g: g / accum, grads)
            loss = loss / accum
        grad_norm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, opt_state, adapters)
        adapters = optax.apply_updates(adapters, updates)
        return adapters, opt_state, rng, loss, grad_norm

    return jax.jit(
        step,
        donate_argnums=(0, 1),
        in_shardings=(None, None, None, None, batch_shardings(mesh, accum)),
    )


def _overlay_replicated(overlay_fn, base_params, adapters, lora_cfg: LoraConfig, mesh: Mesh):
    """Apply/merge the LoRA overlay and gather the result fully replicated, as
    ONE collective jit — safe from TP-sharded base params in multi-host runs
    (every process must call this; host copies land where replication makes
    all shards addressable).

    ``merge_lora``'s safe-merge NaN check needs concrete values (a traced
    bool cannot branch), so the overlay MATH runs inside the collective jit
    (merge math == apply math) and the check runs host-side on the gathered
    result — same raise-on-NaN contract (reference lora_layers.py:204-223),
    jit-safe. Caught by the 2-process PEFT worker: jitting merge_lora
    directly threw TracerBoolConversionError, which also broke every
    single-process final merged-model export."""
    rep = replicated(mesh)
    out_sh = jax.tree.map(lambda _: rep, base_params)
    fn = apply_lora if overlay_fn is merge_lora else overlay_fn
    eff = jax.jit(lambda b, a: fn(b, a, lora_cfg), out_shardings=out_sh)(base_params, adapters)
    if jax.process_count() > 1:
        eff = jax.tree.map(np.asarray, eff)
    if overlay_fn is merge_lora:
        for leaf in jax.tree.leaves(eff):
            if not bool(jnp.isfinite(leaf).all()):
                raise ValueError("NaNs detected in the merged weights. The adapter seems to be broken")
    return eff


def _opt_structure_sig(opt_state) -> str:
    """A signature of the optimizer pytree: structure + per-leaf shape/dtype.
    Saved beside the leaves so a resume with a DIFFERENT optax chain (e.g.
    clip added/removed, schedule changed) fails loudly instead of silently
    unflattening moments into the wrong slots."""
    leaves, treedef = jax.tree_util.tree_flatten(opt_state)
    shapes = ";".join(f"{tuple(l.shape)}:{jnp.asarray(l).dtype}" for l in leaves)
    return f"{treedef}|{shapes}"


def save_adapter_checkpoint(adapters, opt_state, step: int, project_dir: Path, lora_cfg: LoraConfig) -> None:
    ckpt_dir = project_dir / "loras" / f"checkpoint-{step}"
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    save_safetensors(adapters, ckpt_dir / "adapter_model.safetensors")
    flat_opt = jax.tree.map(np.asarray, jax.tree.leaves(opt_state))
    np.savez(
        ckpt_dir / "optimizer.npz",
        *flat_opt,
        step=step,
        structure=np.frombuffer(_opt_structure_sig(opt_state).encode(), dtype=np.uint8),
    )
    (ckpt_dir / "adapter_config.json").write_text(
        f'{{"r": {lora_cfg.r}, "alpha": {lora_cfg.alpha}, "use_dora": {str(lora_cfg.use_dora).lower()}}}'
    )


def prune_adapter_checkpoints(project_dir: Path, max_num: int) -> None:
    """Keep the newest ``max_num`` adapter checkpoints (reference
    trainer_peft.py:160-165)."""
    if max_num <= 0:
        return
    import shutil

    ckpts = sorted(
        (project_dir / "loras").glob("checkpoint-*"),
        key=lambda p: int(p.name.split("-")[1]),
    )
    for stale in ckpts[:-max_num]:
        shutil.rmtree(stale, ignore_errors=True)


def latest_adapter_checkpoint(project_dir: Path) -> Path | None:
    ckpts = sorted(
        (project_dir / "loras").glob("checkpoint-*"),
        key=lambda p: int(p.name.split("-")[1]),
    )
    return ckpts[-1] if ckpts else None


def load_adapter_checkpoint(ckpt_dir: Path, adapters, opt_state):
    # adapters are a FLAT dict keyed by slash-containing param paths, so the
    # safetensors round trip goes through fully-flattened "path/leaf" keys
    # (load_safetensors re-nests on "/" — tree-mapping its output against the
    # flat-keyed adapters dict would mismatch)
    from osufusion_tpu.utils.serialization import flatten_params

    flat = flatten_params(load_safetensors(ckpt_dir / "adapter_model.safetensors"))
    adapters = {
        path: {leaf: jnp.asarray(flat[f"{path}/{leaf}"], ref.dtype) for leaf, ref in entry.items()}
        for path, entry in adapters.items()
    }
    npz = np.load(ckpt_dir / "optimizer.npz")
    if "structure" in npz:
        saved_sig = npz["structure"].tobytes().decode()
        want_sig = _opt_structure_sig(opt_state)
        if saved_sig != want_sig:
            raise ValueError(
                f"optimizer state in {ckpt_dir} was saved with a different optax chain; "
                f"refusing to unflatten by leaf order.\nsaved: {saved_sig}\nwant:  {want_sig}"
            )
    leaves = [npz[f"arr_{i}"] for i in range(len(jax.tree.leaves(opt_state)))]
    opt_state = jax.tree_util.tree_unflatten(jax.tree_util.tree_structure(opt_state), leaves)
    return adapters, opt_state, int(npz["step"])


def adopt_pretrain_architecture(cfg: Config, model_path: Path | None) -> Config:
    """Build the SAME architecture the pretrained weights were trained with.

    The pretrainer saves ``config.json`` next to ``model.safetensors``; trust
    it for every architecture field and keep only the runtime knobs (dtypes,
    quant, remat) from this CLI. Without this, a --model-dim/head-count that
    disagrees with the checkpoint silently fine-tunes half-random weights
    (the lenient loader keeps the init for shape-mismatched keys)."""
    import dataclasses

    if model_path is None:
        return cfg
    cfg_path = Path(model_path).parent / "config.json"
    if not cfg_path.exists():
        return cfg
    saved = Config.load(cfg_path).model
    if saved.dim_h != cfg.model.dim_h:
        print(
            f"note: --model-dim {cfg.model.dim_h} overridden by the pretrained "
            f"checkpoint's config.json (dim_h={saved.dim_h})"
        )
    model = dataclasses.replace(
        saved,
        dtype=cfg.model.dtype,
        param_dtype=cfg.model.param_dtype,
        quant=cfg.model.quant,
        remat=cfg.model.remat,
        remat_mode=cfg.model.remat_mode,
        remat_level_modes=cfg.model.remat_level_modes,
        attn_backend=cfg.model.attn_backend,
    )
    return dataclasses.replace(cfg, model=model)


def train(cfg: Config, model_path: Path, lora_cfg: LoraConfig, resume: bool) -> None:
    main = is_main_process()
    n_proc = jax.process_count()
    say = print if main else (lambda *a, **k: None)
    say("Initializing...")
    cfg = adopt_pretrain_architecture(cfg, model_path)
    project_dir = Path(cfg.train.project_dir)
    project_dir.mkdir(parents=True, exist_ok=True)

    mesh = make_mesh(cfg.train.mesh_data, cfg.train.mesh_model, cfg.train.mesh_seq)
    say(f"mesh: {dict(mesh.shape)} over {len(mesh.devices.flat)} device(s), {n_proc} process(es)")

    model = build_model(cfg.model, cfg.diffusion)
    base_params = model.init_params(jax.random.PRNGKey(cfg.train.seed))
    if model_path is not None:
        say(f"loading pretrained weights from {model_path}")
        from osufusion_tpu.utils.serialization import load_params_lenient

        base_params = load_params_lenient(base_params, load_safetensors(model_path))
    if cfg.train.full_bf16:
        base_params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), base_params)

    adapters = init_lora(base_params, lora_cfg, jax.random.PRNGKey(cfg.train.seed + 1))
    trainable, n_layers = count_lora_params(adapters)
    total = sum(p.size for p in jax.tree.leaves(base_params))
    say(
        f"trainable params: {trainable:,} || all params: {total + trainable:,} || "
        f"trainable%: {trainable / (total + trainable) * 100:.4f} ({n_layers} adapted layers)"
    )

    tx = optax.adamw(make_lr_schedule(cfg))
    if cfg.train.clip_grad_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(cfg.train.clip_grad_norm), tx)
    opt_state = tx.init(adapters)

    current_step = 0
    if resume:
        ckpt = latest_adapter_checkpoint(project_dir)
        if ckpt is not None:
            adapters, opt_state, current_step = load_adapter_checkpoint(ckpt, adapters, opt_state)
            say(f"resumed adapters from {ckpt} at step {current_step}")
            if cfg.train.reset_steps:
                current_step = 0

    base_params, adapters, opt_state = shard_peft(base_params, adapters, opt_state, mesh)
    accum = cfg.train.gradient_accumulation_steps
    step_fn = make_peft_step(model, lora_cfg, tx, mesh, accum=accum)

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
    bucket = min(D.BUCKET, max(64, cfg.train.segment_length))
    assert cfg.train.batch_size % n_proc == 0, (
        f"global batch {cfg.train.batch_size} not divisible by {n_proc} processes"
    )
    local_bs = cfg.train.batch_size // n_proc
    data_state = (
        load_data_state(project_dir, current_step, shard=(jax.process_index(), n_proc)) if resume else None
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
    rng = jax.random.PRNGKey(cfg.train.seed + 2)
    losses: list[float] = []

    say("Training adapters...")
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
        adapters, opt_state, rng, loss, grad_norm = step_fn(adapters, opt_state, base_params, rng, batch)
        current_step += 1

        loss = float(loss)
        losses.append(loss)
        if len(losses) > max(1, cfg.train.save_every):
            losses.pop(0)
        dt = time.time() - t_last
        t_last = time.time()
        say(
            f"step {current_step} loss={loss:.5f} avg={sum(losses)/len(losses):.5f} "
            f"norm={float(grad_norm):.4f} ({dt:.2f}s)",
            flush=True,
        )
        logger.log({"loss": loss, "total_norm": float(grad_norm)}, step=current_step)

        if cfg.train.save_every > 0 and current_step % cfg.train.save_every == 0:
            # ZeRO-sharded moments span processes: gather (collective, all
            # ranks), then process 0 alone writes the host-side npz/safetensors
            save_opt = replicate_params(opt_state, mesh) if n_proc > 1 else opt_state
            if main:
                save_adapter_checkpoint(adapters, save_opt, current_step, project_dir, lora_cfg)
                prune_adapter_checkpoints(project_dir, cfg.train.max_num_checkpoints)
            save_data_state(project_dir, current_step, batches)

        if (
            cfg.train.sample_every > 0
            and current_step % cfg.train.sample_every == 0
            and cfg.train.sample_audio is not None
            and Path(cfg.train.sample_audio).exists()
        ):
            # periodic fixed-seed sampling through the MERGED weights
            # (reference trainer_peft.py:167-207): same bucket-padded path as
            # the pretrainer's hook. The overlay apply + gather runs as ONE
            # collective jit so it works from TP-sharded base params too.
            say("Sampling...")
            from trainer import sample_step

            eff = _overlay_replicated(apply_lora, base_params, adapters, lora_cfg, mesh)
            if main:
                sample_step(
                    model,
                    eff,
                    Path(cfg.train.sample_audio),
                    project_dir,
                    logger,
                    current_step,
                    cfg,
                )

    save_opt = replicate_params(opt_state, mesh) if n_proc > 1 else opt_state
    if main:
        save_adapter_checkpoint(adapters, save_opt, current_step, project_dir, lora_cfg)
        prune_adapter_checkpoints(project_dir, cfg.train.max_num_checkpoints)
    say("Merging adapters...")
    merged = _overlay_replicated(merge_lora, base_params, adapters, lora_cfg, mesh)
    if main:
        save_safetensors(merged, project_dir / "merged_model.safetensors")
    logger.close()
    say("Done.")


def parse_args():
    p = ArgumentParser()
    p.add_argument("--project-dir", type=str, default="runs/peft")
    p.add_argument("--dataset-dir", type=str, default="data")
    p.add_argument("--model-path", type=str, default=None, help="pretrained model.safetensors")
    p.add_argument("--model-type", type=str, default="diffusion", choices=["diffusion", "rectified-flow"])
    p.add_argument("--model-dim", type=int, default=512)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--full-sequence", action="store_true")
    p.add_argument("--random-length", action="store_true")
    p.add_argument("--dummy-dataset", action="store_true")
    p.add_argument("--max-length", type=int, default=0)
    p.add_argument("--segment-length", type=int, default=4096)
    p.add_argument("--no-segment-sr", action="store_true")
    p.add_argument("--sample-density", type=float, default=1.0)
    p.add_argument(
        "--mixed-precision", type=str, default="bf16", choices=["no", "fp16", "bf16", "fp8"]
    )
    p.add_argument("--full-bf16", action="store_true")
    p.add_argument("--gradient-checkpointing", action="store_true")
    p.add_argument(
        "--gradient-checkpointing-mode",
        choices=["block", "save-attn", "save-attn-out", "ff", "resnet", "resnet-dots", "mixed"],
        default="save-attn",
    )
    p.add_argument(
        "--gradient-checkpointing-levels",
        type=str,
        default="save-attn-out,block,block,block",
        help='per-width-level modes for mode "mixed" (see trainer.py)',
    )
    p.add_argument("--gradient-accumulation-steps", type=int, default=1)
    p.add_argument("--clip-grad-norm", type=float, default=0.0)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--total-steps", type=int, default=100000)
    p.add_argument("--save-every", type=int, default=1000)
    p.add_argument("--max-num-checkpoints", type=int, default=5)
    p.add_argument("--warmup-steps", type=int, default=1000)
    p.add_argument("--sample-every", type=int, default=1000)
    p.add_argument("--sample-audio", type=str, default=None)
    p.add_argument("--reset-steps", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num-workers", type=int, default=2)
    p.add_argument("--mesh-data", type=int, default=-1)
    p.add_argument("--mesh-model", type=int, default=1)
    p.add_argument("--mesh-seq", type=int, default=1)
    # LoRA config (reference defaults: r=32 alpha=32 DoRA on)
    p.add_argument("--lora-r", type=int, default=32)
    p.add_argument("--lora-alpha", type=float, default=32.0)
    p.add_argument("--no-dora", action="store_true")
    p.add_argument("--rslora", action="store_true")
    # multi-host launch (parallel/distributed.py; also via OSUFUSION_* env vars)
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

    # fp8 = bf16 activations + dynamically-scaled e4m3 dots (ops/quant.py),
    # same mapping as the pretrainer's --mixed-precision fp8
    dtype = {"no": "float32", "fp16": "float16", "bf16": "bfloat16", "fp8": "bfloat16"}[
        args.mixed_precision
    ]
    cfg = Config(
        model=ModelConfig(
            dim_h=args.model_dim,
            dtype=dtype,
            quant="fp8" if args.mixed_precision == "fp8" else "none",
            remat=args.gradient_checkpointing,
            remat_mode=args.gradient_checkpointing_mode,
            remat_level_modes=tuple(args.gradient_checkpointing_levels.split(",")),
        ),
        diffusion=DiffusionConfig(objective=args.model_type),
        train=TrainConfig(
            project_dir=args.project_dir,
            dataset_dir=args.dataset_dir,
            dataset_mode=mode,
            max_length=args.max_length,
            segment_length=args.segment_length,
            segment_sr=not args.no_segment_sr,
            sample_density=args.sample_density,
            mixed_precision=args.mixed_precision,
            full_bf16=args.full_bf16,
            gradient_checkpointing=args.gradient_checkpointing,
            gradient_accumulation_steps=args.gradient_accumulation_steps,
            clip_grad_norm=args.clip_grad_norm,
            lr=args.lr,
            batch_size=args.batch_size,
            total_steps=args.total_steps,
            save_every=args.save_every,
            max_num_checkpoints=args.max_num_checkpoints,
            warmup_steps=args.warmup_steps,
            sample_every=args.sample_every,
            sample_audio=args.sample_audio,
            reset_steps=args.reset_steps,
            seed=args.seed,
            num_workers=args.num_workers,
            mesh_data=args.mesh_data,
            mesh_model=args.mesh_model,
            mesh_seq=args.mesh_seq,
        ),
    )
    lora_cfg = LoraConfig(
        r=args.lora_r,
        alpha=args.lora_alpha,
        use_dora=not args.no_dora,
        use_rslora=args.rslora,
    )
    dist = (args.coordinator, args.num_processes, args.process_id)
    return cfg, (Path(args.model_path) if args.model_path else None), lora_cfg, args.resume, dist


if __name__ == "__main__":
    from osufusion_tpu.parallel.distributed import maybe_initialize
    from osufusion_tpu.utils.cache import enable_compilation_cache
    from osufusion_tpu.utils.platform import pin_platform_from_env

    pin_platform_from_env()
    cfg, model_path, lora_cfg, resume, _dist = parse_args()
    maybe_initialize(*_dist)  # before any backend/device use
    enable_compilation_cache()
    train(cfg, model_path, lora_cfg, resume)

"""The pjit training loop: sharded train step, grad accumulation, checkpoints.

Capability parity with reference trainer.py's loop (:206-361): AdamW + cosine
warmup half-cycle schedule, gradient accumulation, grad-norm telemetry,
optional clipping, rolling average loss, periodic checkpoint save/prune and
fixed-seed sampling. TPU-native mechanics:

- ONE jitted ``train_step`` whose inputs carry NamedShardings (batch over the
  ``data`` mesh axis, params per the tensor-parallel rules) — XLA places the
  gradient all-reduce on ICI; no Accelerate/NCCL analog needed;
- gradient accumulation micro-steps run inside the jitted step via
  ``lax.scan`` (the reference loops in Python, paying dispatch + an
  all-reduce per micro-batch);
- donated state buffers so optimizer updates are in-place in HBM;
- Orbax checkpoints of {params, opt_state, step, rng} with pruning.
"""

from __future__ import annotations


from pathlib import Path
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
import orbax.checkpoint as ocp
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from osufusion_tpu.config import Config
from osufusion_tpu.models.base import GenerativeModel
from osufusion_tpu.parallel.mesh import host_put, param_shardings, replicated, zero1_shardings


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    rng: jax.Array


def make_lr_schedule(cfg: Config) -> optax.Schedule:
    """Linear warmup then half-cosine decay to zero (reference trainer.py:231-236)."""
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=cfg.train.lr,
        warmup_steps=cfg.train.warmup_steps,
        decay_steps=max(cfg.train.total_steps, cfg.train.warmup_steps + 1),
        end_value=0.0,
    )


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    if cfg.train.opt_moments == "int8":
        from osufusion_tpu.train.quant_opt import adamw_int8

        tx = adamw_int8(make_lr_schedule(cfg))
    else:
        tx = optax.adamw(make_lr_schedule(cfg))
    if cfg.train.clip_grad_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(cfg.train.clip_grad_norm), tx)
    return tx


def init_state(model: GenerativeModel, cfg: Config, rng: jax.Array, seq_len: int = 32) -> TrainState:
    params = model.init_params(rng, seq_len=seq_len)
    if cfg.train.full_bf16:
        params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params, opt_state=opt_state, rng=rng)


def shard_state(state: TrainState, mesh: Mesh, shard_opt_state: bool = True) -> Tuple[TrainState, TrainState]:
    """Place a TrainState on the mesh; returns (placed_state, sharding_tree).

    With ``shard_opt_state`` and a data axis > 1, the AdamW moment trees are
    ZeRO-1 style sharded over the ``data`` axis (largest divisible dim of each
    moment tensor) on top of any tensor-parallel param sharding: GSPMD keeps
    the update math correct and the per-chip optimizer footprint drops by the
    data-axis size — this is what lets the reference's 1.28B-param default
    config train on a v5e slice."""
    p_shard = param_shardings(state.params, mesh)
    rep = replicated(mesh)

    use_zero = shard_opt_state and mesh.shape["data"] > 1
    params_struct = jax.tree_util.tree_structure(state.params)

    def handle_opt(node):
        if jax.tree_util.tree_structure(node) == params_struct:
            if use_zero:
                return zero1_shardings(state.params, mesh, base_shardings=p_shard)
            return p_shard
        return jax.tree.map(lambda _: rep, node)

    opt_shardings = jax.tree.map(
        handle_opt, state.opt_state, is_leaf=lambda n: jax.tree_util.tree_structure(n) == params_struct
    )

    shardings = TrainState(step=rep, params=p_shard, opt_state=opt_shardings, rng=rep)
    placed = host_put(state, shardings)
    return placed, shardings


def batch_shardings(mesh: Mesh, accum: int = 1) -> Tuple[NamedSharding, ...]:
    """NamedShardings for one (x, a, c, orig_len) batch on ``mesh``.

    Batch arrays: (B, ...) sharded over ``data``, or (accum, B, ...) with the
    accum axis unsharded. With a seq axis > 1, the frame axis of x (B, 6, T)
    and a (B, 96, T) shards over it — the attention sites then run the
    halo-exchange kernels (parallel/sequence.py) instead of gathering T.
    Multi-host feeding (parallel/distributed.py) lays per-process rows onto
    these same shardings via ``make_array_from_process_local_data``.
    """
    lead = () if accum <= 1 else (None,)
    if mesh.shape.get("seq", 1) > 1:
        xa_spec = P(*lead, "data", None, "seq")
    else:
        xa_spec = P(*lead, "data")
    bc_spec = P(*lead, "data")
    sh = lambda s: NamedSharding(mesh, s)
    return (sh(xa_spec), sh(xa_spec), sh(bc_spec), sh(bc_spec))


def make_train_step(model: GenerativeModel, cfg: Config, mesh: Mesh, state_shardings: Optional[TrainState] = None):
    """Build the jitted sharded train step.

    Batch: (x, a, c, orig_len) with leading batch dim sharded over ``data``.
    Gradient accumulation (if configured) scans micro-batches INSIDE the step.
    Returns (state, metrics{loss, grad_norm, lr}).

    Pass ``state_shardings`` (the tree ``shard_state`` returns) to pin the
    output state to the input placement. Without it GSPMD is free to emit
    params with a different sharding than they came in with (it picks
    P("data") — a free ZeRO-3 flavor), which (a) forces a silent recompile on
    the second step because the input signature changed, and (b) leaves
    params non-fetchable from a single host in multi-process runs. Metrics
    are pinned replicated so every host can read them.
    """
    tx = make_optimizer(cfg)
    lr_sched = make_lr_schedule(cfg)
    accum = cfg.train.gradient_accumulation_steps
    # fp16 has a ~5.96e-8 smallest normal: without scaling, small gradients
    # underflow to zero (the reference routes fp16 through Accelerate's
    # GradScaler). A static 2^12 scale on the loss, divided back out of the
    # grads, keeps the bwd pass in fp16's dynamic range; bf16/f32 need none.
    loss_scale = 4096.0 if cfg.train.mixed_precision == "fp16" else 1.0

    def loss_fn(params, rng, batch):
        x, a, c, orig_len = batch
        return model.loss(params, rng, x, a, c, orig_len) * loss_scale

    def step_fn(state: TrainState, batch):
        rng, rng_step = jax.random.split(state.rng)

        if accum <= 1:
            loss, grads = jax.value_and_grad(loss_fn)(state.params, rng_step, batch)
        else:
            # micro-batches stacked on a leading axis: (accum, B, ...)
            rngs = jax.random.split(rng_step, accum)

            def micro(carry, inp):
                grads_acc, loss_acc = carry
                r, mb = inp
                loss_i, grads_i = jax.value_and_grad(loss_fn)(state.params, r, mb)
                grads_acc = jax.tree.map(jnp.add, grads_acc, grads_i)
                return (grads_acc, loss_acc + loss_i), None

            zero_grads = jax.tree.map(jnp.zeros_like, state.params)
            (grads, loss), _ = jax.lax.scan(micro, (zero_grads, 0.0), (rngs, batch))
            grads = jax.tree.map(lambda g: g / accum, grads)
            loss = loss / accum

        if loss_scale != 1.0:
            grads = jax.tree.map(lambda g: (g.astype(jnp.float32) / loss_scale).astype(g.dtype), grads)
            loss = loss / loss_scale

        grad_norm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        metrics = {
            "loss": loss,
            "grad_norm": grad_norm,
            "lr": lr_sched(state.step),
        }
        new_state = TrainState(step=state.step + 1, params=params, opt_state=opt_state, rng=rng)
        return new_state, metrics

    batch_sh = batch_shardings(mesh, accum)
    seq_n = mesh.shape.get("seq", 1)

    if state_shardings is not None:
        rep = replicated(mesh)
        metrics_sh = {"loss": rep, "grad_norm": rep, "lr": rep}
        jitted = jax.jit(
            step_fn,
            donate_argnums=(0,),
            in_shardings=(state_shardings, batch_sh),
            out_shardings=(state_shardings, metrics_sh),
        )
    else:
        jitted = jax.jit(
            step_fn,
            donate_argnums=(0,),
            in_shardings=(None, batch_sh),
        )
    if seq_n <= 1:
        return jitted

    # the seq-parallel dispatch reads the AMBIENT mesh (ops/attention.py);
    # establish it around trace and execution
    def step_with_mesh(state, batch):
        with jax.sharding.set_mesh(mesh):
            return jitted(state, batch)

    return step_with_mesh


def replicate_params(params, mesh: Mesh):
    """Re-place a (possibly TP/ZeRO-sharded) param tree fully replicated.

    A jitted identity with replicated out_shardings: XLA emits the
    all-gathers (a collective — in a multi-host run EVERY process must call
    this). Used before the trainer's periodic sampling hook so ``model.sample``
    sees whole tensors regardless of the training mesh, and before the final
    host-side safetensors export in multi-host runs (on one process every
    shard is addressable and ``np.asarray`` suffices). Returns numpy arrays
    when multi-process (fully-replicated arrays are fully-addressable, so the
    host copy is local), on-device arrays otherwise.
    """
    rep = replicated(mesh)
    out_sh = jax.tree.map(lambda _: rep, params)
    gathered = jax.jit(lambda p: p, out_shardings=out_sh)(params)
    if jax.process_count() > 1:
        import numpy as np

        gathered = jax.tree.map(np.asarray, gathered)
    return gathered


# --------------------------------------------------------------- checkpoints


def checkpoint_manager(project_dir: Path, max_to_keep: int) -> ocp.CheckpointManager:
    path = Path(project_dir).absolute() / "checkpoints"
    return ocp.CheckpointManager(
        path,
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


def save_checkpoint(mngr: ocp.CheckpointManager, state: TrainState) -> None:
    step = int(state.step)
    mngr.save(step, args=ocp.args.StandardSave(_to_saveable(state)))


def restore_checkpoint(mngr: ocp.CheckpointManager, state: TrainState, step: Optional[int] = None) -> TrainState:
    step = step if step is not None else mngr.latest_step()
    restored = mngr.restore(step, args=ocp.args.StandardRestore(_to_saveable(state)))
    return TrainState(
        step=jnp.asarray(restored["step"], jnp.int32),
        params=restored["params"],
        opt_state=restored["opt_state"],
        rng=jnp.asarray(restored["rng"], jnp.uint32),
    )


def _to_saveable(state: TrainState) -> dict:
    rng = state.rng
    if hasattr(jax.random, "key_data") and jnp.issubdtype(rng.dtype, jax.dtypes.prng_key):
        rng = jax.random.key_data(rng)
    return {"step": state.step, "params": state.params, "opt_state": state.opt_state, "rng": rng}


def _data_state_path(project_dir: Path, shard_id: int) -> Path:
    """Per-process resume file: each host's pipeline walks its own stripe of
    the position stream (train/data.py shard=), so each saves its own
    position. Process 0 keeps the legacy name; hosts share the filesystem
    (an Orbax requirement already)."""
    name = "data_state.json" if shard_id == 0 else f"data_state_p{shard_id}.json"
    return Path(project_dir) / name


def save_data_state(project_dir: Path, step: int, pipeline) -> None:
    """Persist the input pipeline's resume position next to the checkpoint.

    Positional randomness (train/data.py) makes ``{"epoch", "index"}`` the
    FULL data-order state — the equivalent of the reference checkpointing
    torch RNG blobs (reference trainer.py:148-177). The stripe layout
    (shard_id/num_shards) is recorded so a resume under a DIFFERENT process
    count fails loudly instead of silently re-walking or skipping samples:
    ``i % num_shards`` striping is only meaningful for the count it was
    saved with."""
    import json

    st = {
        "step": step,
        **pipeline.state(),
        "shard_id": pipeline.shard_id,
        "num_shards": pipeline.num_shards,
    }
    _data_state_path(project_dir, pipeline.shard_id).write_text(json.dumps(st))


def load_data_state(
    project_dir: Path, current_step: int, shard: Tuple[int, int] = (0, 1)
) -> Optional[dict]:
    """Resume position saved at ``current_step``, or None (fresh data order)
    if absent or recorded at a different step.

    ``shard`` is this process's (shard_id, num_shards). A layout mismatch —
    the file records a different stripe layout, or a rank's file is missing
    in a multi-process resume at a nonzero step — raises instead of silently
    restarting that rank's stripe at epoch 0 (which would duplicate rank-0's
    early samples and skip this rank's later ones)."""
    import json

    shard_id, num_shards = shard
    p = _data_state_path(project_dir, shard_id)
    if not p.exists():
        if num_shards > 1 and current_step > 0:
            raise RuntimeError(
                f"process {shard_id}/{num_shards}: no data-state file {p} for resume at "
                f"step {current_step} — this run was saved under a different process "
                "count. Resume with the original count, or pass --reset-steps to "
                "restart the data order on every rank together."
            )
        return None
    st = json.loads(p.read_text())
    saved_layout = (int(st.get("shard_id", 0)), int(st.get("num_shards", 1)))
    if saved_layout != (shard_id, num_shards):
        raise RuntimeError(
            f"data-state file {p} was saved by process {saved_layout[0]} of "
            f"{saved_layout[1]} but this run is process {shard_id} of {num_shards}: "
            "the position stripe does not transfer across process counts. Resume "
            "with the original count, or delete the data_state*.json files to "
            "restart the data order on every rank together."
        )
    if st.get("step") != current_step:
        return None
    return {"epoch": int(st["epoch"]), "index": int(st["index"])}



"""One process of a multi-host training-parity check (tests/test_multihost.py).

Runs ONE data-parallel train step on a tiny UNet over an 8-device global mesh,
feeding only this process's rows of a deterministic global batch through
``make_global_batch`` — the exact per-host feeding path trainer.py uses. With
``--num-processes 1`` the same step runs single-controller on 8 local virtual
devices; the two losses must match, proving the multi-host path computes the
same global step the single-process path does (the reference gets this
property from Accelerate DDP, reference trainer.py:211-264).

Also round-trips an Orbax checkpoint (multi-process save is collective) and
asserts the restored step/params match.

With a 6th arg ``peft``, the step is instead one LoRA/DoRA ADAPTER step (the
trainer_peft.py path): sharded PEFT step over the same global mesh + per-host
feeding, followed by the collective ``_overlay_replicated`` merge — the two
pieces of the PEFT trainer's multi-host wiring that only execute under
``process_count() > 1``.

Usage: python scripts/multihost_worker.py PROCESS_ID NUM_PROCESSES PORT OUTFILE CKPT_DIR [peft]
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root


def main() -> None:
    pid, n_proc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    outfile, ckpt_dir = sys.argv[4], sys.argv[5]
    peft_mode = len(sys.argv) > 6 and sys.argv[6] == "peft"
    n_local = 8 // n_proc

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_local}"

    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        jax.extend.backend.clear_backends()
    except Exception:
        pass

    from osufusion_tpu.parallel.distributed import (
        is_main_process,
        local_batch_slice,
        make_global_batch,
        maybe_initialize,
    )

    if n_proc > 1:
        started = maybe_initialize(
            coordinator=f"localhost:{port}", num_processes=n_proc, process_id=pid
        )
        assert started and jax.process_count() == n_proc

    import numpy as np

    from osufusion_tpu.config import Config, DiffusionConfig, ModelConfig, TrainConfig
    from osufusion_tpu.models import build_model
    from osufusion_tpu.parallel import make_mesh
    from osufusion_tpu.train.loop import (
        batch_shardings,
        checkpoint_manager,
        init_state,
        make_train_step,
        restore_checkpoint,
        save_checkpoint,
        shard_state,
    )

    model_cfg = ModelConfig(
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
    cfg = Config(
        model=model_cfg,
        diffusion=DiffusionConfig(),
        train=TrainConfig(batch_size=8, total_steps=1, warmup_steps=1, lr=1e-4, mesh_data=8),
    )
    mesh = make_mesh(data=8)
    model = build_model(cfg.model, cfg.diffusion)
    state = init_state(model, cfg, jax.random.PRNGKey(0), seq_len=64)
    state, state_sh = shard_state(state, mesh)
    step_fn = make_train_step(model, cfg, mesh, state_shardings=state_sh)

    # the SAME deterministic global batch in every launch shape
    B, N = 8, 64
    rng = np.random.default_rng(0)
    full = (
        rng.uniform(-1, 1, (B, 6, N)).astype(np.float32),
        rng.normal(-10, 1, (B, 96, N)).astype(np.float32),
        rng.uniform(-1, 1, (B, 5)).astype(np.float32),
        np.full(B, N, dtype=np.int32),
    )
    start, rows = local_batch_slice(B)
    local = tuple(b[start : start + rows] for b in full)
    batch = make_global_batch(local, batch_shardings(mesh))

    if peft_mode:
        _run_peft(model, state.params, mesh, batch, outfile, n_proc, pid)
        return

    state, metrics = step_fn(state, batch)
    loss = float(metrics["loss"])

    # Orbax save/restore is collective across processes
    mngr = checkpoint_manager(ckpt_dir, max_to_keep=1)
    save_checkpoint(mngr, state)
    mngr.wait_until_finished()
    fresh = init_state(model, cfg, jax.random.PRNGKey(0), seq_len=64)
    fresh, _ = shard_state(fresh, mesh)
    restored = restore_checkpoint(mngr, fresh)
    assert int(restored.step) == int(state.step) == 1
    p0 = jax.tree.leaves(state.params)[0]
    r0 = jax.tree.leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(jax.device_get(r0)), np.asarray(jax.device_get(p0)))

    if is_main_process():
        with open(outfile, "w") as f:
            json.dump({"loss": loss, "grad_norm": float(metrics["grad_norm"])}, f)
    print(f"p{pid}: loss={loss:.6f} ok", flush=True)

    # all work is done and verified; the gloo/distributed service threads are
    # non-daemon and hang interpreter teardown, so leave explicitly after a
    # barrier (so no process exits while a peer still has collectives pending)
    if n_proc > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("worker done")
        sys.stdout.flush()
        os._exit(0)


def _run_peft(model, base_params, mesh, batch, outfile: str, n_proc: int, pid: int) -> None:
    """One sharded LoRA/DoRA adapter step + the collective merged-model
    gather — trainer_peft.py's multi-host path, asserted to match the
    single-process run by tests/test_multihost.py."""
    import jax
    import numpy as np
    import optax

    from osufusion_tpu.parallel.distributed import is_main_process
    from osufusion_tpu.peft import LoraConfig, init_lora, merge_lora
    from trainer_peft import _overlay_replicated, make_peft_step, shard_peft

    lora_cfg = LoraConfig(r=4, alpha=4.0, use_dora=True)
    adapters = init_lora(base_params, lora_cfg, jax.random.PRNGKey(7))
    tx = optax.adamw(1e-3)
    opt_state = tx.init(adapters)
    base_params, adapters, opt_state = shard_peft(base_params, adapters, opt_state, mesh)
    step = make_peft_step(model, lora_cfg, tx, mesh)

    adapters, opt_state, _, loss, grad_norm = step(
        adapters, opt_state, base_params, jax.random.PRNGKey(3), batch
    )
    loss = float(loss)

    # collective merge: every process participates; the merged tree must be
    # identical everywhere (checksum a stable digest of a few leaves)
    merged = _overlay_replicated(merge_lora, base_params, adapters, lora_cfg, mesh)
    leaves = jax.tree.leaves(merged)
    checksum = float(sum(np.abs(np.asarray(jax.device_get(l))).sum() for l in leaves[:5]))

    if is_main_process():
        with open(outfile, "w") as f:
            json.dump({"loss": loss, "grad_norm": float(grad_norm), "merged_checksum": checksum}, f)
    print(f"p{pid}: peft loss={loss:.6f} merged_checksum={checksum:.4f} ok", flush=True)
    if n_proc > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("peft worker done")
        sys.stdout.flush()
        os._exit(0)


if __name__ == "__main__":
    main()

"""Multi-host (multi-process) training support.

The reference gets multi-node DDP from HF Accelerate: `accelerate launch`
starts one process per node, torch.distributed/NCCL wires them together, the
DataLoader shards by process, and `is_main_process` gates logging/checkpoints
(reference trainer.py:211-220,:264,:321,:332). The TPU-native equivalent
(SURVEY.md section 5.8) is:

- ``jax.distributed.initialize`` — one process per host, TPU workers discover
  each other over ICI/DCN (on Cloud TPU pods the coordinator/process-id args
  come from the metadata server and may be omitted);
- ONE global mesh over ``jax.devices()`` (the global device list) — exactly
  what ``parallel.mesh.make_mesh`` already builds; XLA then places gradient
  all-reduces on ICI within a slice and DCN across slices;
- per-host batch assembly: every process feeds the rows of the global batch
  that live on its addressable devices via
  ``jax.make_array_from_process_local_data`` — the analog of Accelerate's
  per-process DataLoader shard;
- process-0 gating for host-side effects (JSONL/wandb metrics, sample
  renders); Orbax checkpoint save/restore is collective and runs on all
  processes against a shared filesystem.

Launch surface (mirrors the reference's `accelerate launch` knobs)::

    # host 0                                 # host 1
    python trainer.py --coordinator h0:9999 \
        --num-processes 2 --process-id 0 ...  ... --process-id 1 ...

or via env vars OSUFUSION_COORDINATOR / OSUFUSION_NUM_PROCESSES /
OSUFUSION_PROCESS_ID (so the same command line works on every host of a pod
launcher). Single-process runs are untouched: ``maybe_initialize`` is a no-op
and ``make_global_batch`` passes numpy batches straight through to jit.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np


def _env_int(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v not in (None, "") else None


def maybe_initialize(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize ``jax.distributed`` when a multi-process launch is requested.

    Arguments fall back to OSUFUSION_COORDINATOR / OSUFUSION_NUM_PROCESSES /
    OSUFUSION_PROCESS_ID. Returns True when distributed mode was initialized.
    With no multi-process request (num_processes absent or 1) this is a no-op,
    so every existing single-host invocation behaves exactly as before.

    On Cloud TPU pod slices all three args may be omitted but
    OSUFUSION_NUM_PROCESSES=auto must be set: jax.distributed then resolves
    the topology from the TPU metadata environment.
    """
    auto = os.environ.get("OSUFUSION_NUM_PROCESSES") == "auto"
    coordinator = coordinator or os.environ.get("OSUFUSION_COORDINATOR")
    if num_processes is None and not auto:
        num_processes = _env_int("OSUFUSION_NUM_PROCESSES")
    if process_id is None:
        process_id = _env_int("OSUFUSION_PROCESS_ID")
    if not auto and (num_processes is None or num_processes <= 1):
        return False

    # CPU backends (the virtual-device test recipe, README) need an explicit
    # cross-process collectives implementation; TPU backends ignore this.
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:  # older jax or no gloo build: TPU path works regardless
        pass

    kwargs = {}
    if coordinator is not None:
        kwargs["coordinator_address"] = coordinator
    if not auto:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    return True


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    """Host-side-effect gate (reference trainer.py:321 `is_main_process`)."""
    return jax.process_index() == 0


def local_batch_slice(global_batch: int) -> Tuple[int, int]:
    """(start_row, rows) of the global batch this process feeds.

    The mesh lays the ``data`` axis out data-major over ``jax.devices()``,
    whose global ordering groups each process's devices contiguously — so
    process p owns rows [p*B/P, (p+1)*B/P). ``make_global_batch`` does not
    actually rely on contiguity (make_array_from_process_local_data maps rows
    by the sharding's addressable shards); this helper exists for data
    pipelines that want to materialize only their rows, so it VERIFIES the
    contiguity assumption instead of silently returning wrong indices under
    an exotic device order.
    """
    n = jax.process_count()
    assert global_batch % n == 0, f"global batch {global_batch} not divisible by {n} processes"
    proc_order = [d.process_index for d in jax.devices()]
    assert proc_order == sorted(proc_order), (
        f"jax.devices() does not group processes contiguously in process order "
        f"({proc_order}); derive rows from the batch sharding's addressable shards instead"
    )
    rows = global_batch // n
    return jax.process_index() * rows, rows


def make_global_batch(batch: Sequence[np.ndarray], shardings: Sequence[jax.sharding.NamedSharding]):
    """Assemble per-host arrays into global jax.Arrays laid out per sharding.

    Single-process: passthrough (jit consumes numpy directly, as before).
    Multi-process: each element of ``batch`` holds only this process's rows;
    ``jax.make_array_from_process_local_data`` builds the global array without
    any host gather — each host device_puts its own shards, the analog of
    Accelerate's per-process DataLoader feeding DDP ranks.
    """
    if jax.process_count() == 1:
        return tuple(batch)
    return tuple(
        jax.make_array_from_process_local_data(sh, np.asarray(b)) for b, sh in zip(batch, shardings)
    )

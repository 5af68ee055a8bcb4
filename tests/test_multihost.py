"""Multi-host (multi-process) training: a 2-process CPU launch computes the
same global DP step as a single process (SURVEY.md section 5.8 — the reference
delegates multi-node DDP to Accelerate, reference trainer.py:211-264; here
``jax.distributed.initialize`` + per-host ``make_array_from_process_local_data``
feeding replaces it).

The subprocess legs run ``scripts/multihost_worker.py``: process gloo
collectives over localhost, an 8-device global mesh (2x4 virtual CPU devices),
one train step on a deterministic global batch, and a collective Orbax
checkpoint round-trip. The in-process tests cover the pipeline striping and
batch-slice helpers without subprocesses.
"""

from __future__ import annotations

import json
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
WORKER = REPO / "scripts" / "multihost_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(n_proc: int, tmp_path: Path, mode: str = "pretrain") -> dict:
    port = _free_port()
    out = tmp_path / f"out_{mode}_{n_proc}.json"
    ckpt = tmp_path / f"ckpt_{mode}_{n_proc}"
    extra = ["peft"] if mode == "peft" else []
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(pid), str(n_proc), str(port), str(out), str(ckpt), *extra],
            cwd=REPO,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(n_proc)
    ]
    logs = []
    for p in procs:
        # generous: the host has ONE CPU core, and each worker pays a full
        # jax import + tiny-model compile; under parallel load 600 s can trip
        stdout, _ = p.communicate(timeout=1200)
        logs.append(stdout)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed (rc={p.returncode}):\n{log[-4000:]}"
    return json.loads(out.read_text())


def test_two_process_dp_step_matches_single_process(tmp_path):
    """One global DP step over mesh data=8: 2 processes x 4 virtual devices,
    each feeding its own batch rows, must produce the single-process loss —
    and the collective Orbax save/restore inside the workers must round-trip."""
    single = _run_workers(1, tmp_path)
    double = _run_workers(2, tmp_path)
    np.testing.assert_allclose(double["loss"], single["loss"], rtol=1e-5)
    np.testing.assert_allclose(double["grad_norm"], single["grad_norm"], rtol=1e-4)


def test_two_process_peft_step_matches_single_process(tmp_path):
    """The PEFT trainer's multi-host wiring (VERDICT r04 weak #6): one sharded
    LoRA/DoRA adapter step over mesh data=8 fed per-host, then the collective
    ``_overlay_replicated`` merge — 2 processes must reproduce the
    single-process loss, grad norm, AND merged-model checksum."""
    single = _run_workers(1, tmp_path, mode="peft")
    double = _run_workers(2, tmp_path, mode="peft")
    np.testing.assert_allclose(double["loss"], single["loss"], rtol=1e-5)
    np.testing.assert_allclose(double["grad_norm"], single["grad_norm"], rtol=1e-4)
    np.testing.assert_allclose(double["merged_checksum"], single["merged_checksum"], rtol=1e-5)


# ------------------------------------------------- in-process helper behavior


def test_pipeline_stripe_union_covers_stream():
    """Process stripes of the DataPipeline partition the position stream: the
    union of 2 shards' samples over one epoch equals the unsharded stream's
    samples, each bit-identical (positional randomness makes sample (e, i)
    independent of who materializes it)."""
    from osufusion_tpu.train.data import DataPipeline, DummyDataset

    def collect(shard, n_batches, batch=2):
        ds = DummyDataset(num_samples=8, seed=3, min_length=64, max_length=128)
        pipe = DataPipeline(ds, batch, bucket=64, num_workers=1, shard=shard)
        got = []
        for _ in range(n_batches):
            x, a, c, ol = next(pipe)
            got.extend(float(c[i].sum()) for i in range(len(ol)))
        return got

    full = collect((0, 1), 4)  # 8 samples = one epoch
    s0 = collect((0, 2), 2)
    s1 = collect((1, 2), 2)
    assert sorted(s0 + s1) == pytest.approx(sorted(full))
    assert len(set(full)) == len(full) > 0


def test_pipeline_sharded_resume_is_exact():
    """A sharded pipeline resumed from state() continues its own stripe."""
    from osufusion_tpu.train.data import DataPipeline, DummyDataset

    def make(start=None):
        ds = DummyDataset(num_samples=16, seed=7, min_length=64, max_length=128)
        return DataPipeline(ds, 2, bucket=64, num_workers=1, shard=(1, 2), start=start)

    pipe = make()
    next(pipe)
    st = pipe.state()
    expect = next(pipe)
    resumed = next(make(start=st))
    for e, r in zip(expect, resumed):
        np.testing.assert_array_equal(e, r)


def test_local_batch_slice_single_process():
    from osufusion_tpu.parallel.distributed import local_batch_slice, make_global_batch

    start, rows = local_batch_slice(8)
    assert (start, rows) == (0, 8)
    # single-process make_global_batch is a passthrough
    arrs = (np.ones((2, 3)), np.zeros(2))
    out = make_global_batch(arrs, (None, None))
    assert out[0] is arrs[0] and out[1] is arrs[1]

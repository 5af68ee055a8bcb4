"""Flash attention for TPU in Pallas: the framework's centerpiece kernel.

Replaces the reference's CUDA flash-SDPA dependency (reference
osu_fusion/modules/attention.py:61-101) with a TPU-native tiled kernel:

- FlashAttention-2 style online softmax: the (T, S) logits matrix is never
  materialized — HBM traffic is O(T*D) instead of O(T^2);
- SEQUENCE-MAJOR layout: blocks are read straight from the (B, T, H, D)
  activations the QKV projections produce, so there are NO (B,T,H,D) <->
  (B,H,T,D) transposes anywhere in the attention path — in the backward
  pass of the UNet those copies alone cost ~10% of a train step;
- HEAD FOLDING for MQA: a q block is a CONTIGUOUS (1, bq, H, D) slab whose
  merge to (bq*H, D) rows is a VMEM layout no-op (row r = (t=r//H, h=r%H)),
  so KV is loaded once per q block and the MXU sees (H*bq, D) matmuls
  instead of `heads` skinny ones;
- WIDE KV BLOCKS: 1024-wide KV blocks halve the online-softmax rescale
  passes and the per-visit fixed costs; the f32 logits chunk is kept inside
  the 16 MB VMEM budget by SHRINKING block_q (down to 64 timesteps — the
  folded matmul M-dim stays MXU-sized at H*64 = 1024 rows);
- TILING-AWARE operand shapes: KV rides as rank-3 (B, S, D) — a rank-4 KV
  with a singleton Kv axis lands in (8, 128) HBM tiles at 16x padding and
  was measured 3x slower end to end; the softmax-stat residual crosses the
  fwd->bwd boundary squeezed to dense (B, rows) for the same reason;
- base-2 softmax END TO END: scale*log2(e) is folded into q before the
  kernel, logits live in the exp2 domain and the VPU runs exp2 directly —
  in the BACKWARD kernels too (base-2 LSE residual; the ds chain-rule ln2
  rides the dq kernel's lse shift and the dkv kernel's finalize, so no
  whole-chunk or whole-tensor scale passes anywhere);
- optional LOCAL (sliding-window) attention: each query attends keys within
  +/- window/2 and the kernel only VISITS the KV blocks intersecting the
  window, with EXACT per-offset block spans — full-song (65k-frame) UNet
  levels drop from O(T^2) to O(T*W) FLOPs (SURVEY.md section 5.7);
- grid (batch, q_block, kv_visit) with VMEM accumulator scratch carried
  across the innermost (sequential) dimension; softmax stats fp32;
- custom VJP with the standard recompute backward; thanks to the fold, the
  dkv kernel accumulates all heads in-kernel and emits (B, S, D) directly.

The kernel itself is MQA (kv_heads == 1 — the UNet's production config);
GQA/MHA (the DiT/MMDiT backbones) run one MQA call per KV head over its
contiguous query-head slice. Shapes the kernel doesn't tile (sequence not a
multiple of 64) and non-TPU backends fall back to the XLA grouped einsum.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PREFERRED_BLOCK_K = 1024
# budget for the f32 logits chunk (rows x block_k): it plus its exp'd copy,
# the (rows, D) accumulator and the double-buffered KV blocks must fit the
# 16 MB VMEM (forward AND backward kernels).
LOGITS_VMEM_BYTES = 4 << 20
TARGET_FOLDED_ROWS = 2048
NEG_INF = -1e30
LOG2E = math.log2(math.e)
LN2 = math.log(2.0)

_INFERENCE = __import__("contextvars").ContextVar("osufusion_flash_inference", default=False)


def inference_attention():
    """Trace-time hint: the enclosed computation is forward-only, so the
    kernel may use bf16 logits (halving the softmax VPU passes and the
    logits VMEM) that the backward's residual consistency could not."""
    import contextlib

    @contextlib.contextmanager
    def ctx():
        token = _INFERENCE.set(True)
        try:
            yield
        finally:
            _INFERENCE.reset(token)

    return ctx()


def _pick_block(t: int, preferred: int) -> int:
    for b in (preferred, 1024, 512, 256, 128, 64):
        if b <= preferred and t % b == 0:
            return b
    return 0


def _choose_blocks(t: int, s: int, group: int) -> tuple[int, int, int]:
    """(block_q, block_k, fold) for a head-group of ``group`` query heads.

    The fold is always the FULL head group: a (1, bq, H, D) slab of the
    seq-major array is a contiguous HBM range, so every DMA moves 100s of KB
    in one burst (a partial-H block would gather fold*D-element slivers per
    timestep — measured ~3x slower end to end). block_k is as wide as
    divisibility allows (fewer visits = fewer softmax rescale passes); the
    logits chunk is kept inside the VMEM budget by shrinking block_q instead
    of the fold — with the production 16-head fold even bq=64 leaves a
    1024-row M dimension on the MXU.
    """
    bytes_per = 2 if _INFERENCE.get() else 4
    preferred_k = PREFERRED_BLOCK_K
    while True:
        bk = _pick_block(s, preferred_k)
        rows_cap = max(64, LOGITS_VMEM_BYTES // (bytes_per * bk)) if bk else 64
        rows = min(TARGET_FOLDED_ROWS, rows_cap)
        bq = _pick_block(t, max(64, rows // group))
        # the bq floor of 64 can defeat the rows cap for large folds (e.g. a
        # 32-head MQA fold gives 2048 rows at bq=64): shrink bk instead until
        # the f32 logits chunk fits the VMEM budget
        if not (bq and bk) or bq * group * bk * bytes_per <= LOGITS_VMEM_BYTES or preferred_k <= 128:
            return bq, bk, group
        preferred_k //= 2


def _choose_tfold(t: int, s: int) -> tuple[int, int, int]:
    """Block choice for a SINGLE-head (H=1) GLOBAL-attention call.

    A (1, bq, 1, D) q block has a unit sublane dim Mosaic pads 8-16x and
    whose (bq, D) merge it refuses to lower — so fold consecutive TIMESTEPS
    into the kernel's row dimension instead: the caller reshapes
    (B, t, 1, D) -> (B, t/f, f, D) (a pure reinterpretation of seq-major
    memory; row r of q block i = timestep i*bq*f + r) and the kernel treats
    f timesteps as a head fold. Exact for global attention — every row is an
    independent softmax and nothing row-position-dependent runs inside.
    Returns (bq, bk, f) with f > 1, or (0, 0, 0) when no fold tiles."""
    for f in (16, 8, 4, 2):
        if t % f == 0:
            bq, bk, _ = _choose_blocks(t // f, s, f)
            if bq and bk:
                return bq, bk, f
    return 0, 0, 0


def _span_visits(window: Optional[int], block_src: int, block_tgt: int, n_target: int) -> int:
    """Number of ``block_tgt``-wide target blocks visited per ``block_src``-wide
    source block under a +/- window/2 span, with EXACT per-offset starts.

    Visit j of source block i maps to target block
    ``floor((i*block_src - window//2) / block_tgt) + j`` — the exact first
    block intersecting that source block's span, so no offset over-visits.
    Source offsets within a target block repeat with period lcm/block_src;
    n_visit is the max span over one period. Out-of-range visits are masked
    off inside the kernel.
    """
    if window is None:
        return n_target
    w2 = window // 2
    period = math.lcm(block_src, block_tgt) // block_src
    return max(
        (p + block_src - 1 + w2) // block_tgt - (p - w2) // block_tgt + 1
        for p in (i * block_src for i in range(period))
    )


def _stats_shape(B: int, nq: int, rows: int) -> tuple[int, int, int]:
    """Softmax-stat (lse/delta) kernel-side storage: (B, nq*rows, 1) f32.

    Row r of q-block i lives at [b, i*rows + r, 0] — a plain row-major
    reshape of the per-row vector, consumed as (1, rows, 1) blocks whose
    (rows, 1) tile Mosaic accepts without any lane<->sublane shape cast.
    The trailing singleton means the TRANSIENT is lane-padded in HBM — the
    residual held across fwd->bwd is squeezed to dense (B, nq*rows)."""
    return (B, nq * rows, 1)


def _masked(s: jnp.ndarray, q_start, k_start, window: Optional[int], fold: int) -> jnp.ndarray:
    """Window-mask a (bq*fold, bk) logits chunk; row r sits at position
    q_start + r//fold (fold consecutive rows share one query position).

    Positions are built from a (R, 1) and a (1, C) iota so the expensive
    full-chunk iota + integer-divide passes never materialize — only the
    broadcast subtract/compare/select touch all R*C lanes."""
    if window is None:
        return s
    rows = (
        q_start
        + jax.lax.broadcasted_iota(jnp.int32, (s.shape[0], 1), 0) // fold
    )
    cols = k_start + jax.lax.broadcasted_iota(jnp.int32, (1, s.shape[1]), 1)
    return jnp.where(jnp.abs(rows - cols) <= window // 2, s, NEG_INF)


# ----------------------------------------------------------------- forward


def _rot_half(x: jnp.ndarray) -> jnp.ndarray:
    """rotate-half on the last (head) dim, in VMEM."""
    d = x.shape[-1]
    return jnp.concatenate([-x[..., d // 2 :], x[..., : d // 2]], axis=-1)


def _unrotate(g: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Adjoint of the rotary map x -> x*cos + rot_half(x)*sin, in VMEM.

    rot_half is orthogonal with rot_half^T = -rot_half, so
    J^T g = g*cos - rot_half(g*sin). With SCALE-carrying tables (the q side)
    the adjoint lands directly in the raw input's frame, scale included."""
    return g * cos - _rot_half(g * sin)


def _fwd_kernel(
    *refs, bq, bk, nk, nq, fold, window, fast, rope, dense
):
    """One (q-block, kv-visit) step. q_ref block is (1, bq, H, D) read
    straight from the seq-major (B, T, H, D) array; the merge to (bq*H, D)
    rows is a VMEM layout no-op (row r = (t=r//H, h=r%H)). Logits are in the
    exp2 domain (q pre-scaled by scale*log2e — or, with ``rope``, by tables
    that carry the scale; see ``_flash_fwd``). With ``dense`` the LSE leaves
    as one LANE-major row of a (8, rows) output block (the padded column
    layout costs a 128x lane-padded HBM tensor — see ``_flash_fwd``)."""
    if rope:
        q_ref, k_ref, v_ref, cq_ref, sq_ref, o_ref, lse_ref, acc_ref, m_ref, l_ref, qrot_ref = refs
    else:
        q_ref, k_ref, v_ref, o_ref, lse_ref, acc_ref, m_ref, l_ref = refs
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    n_visit = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        if rope:
            # rotate q ONCE per block (it is pinned across the whole kv
            # sweep) into scratch; k arrives PRE-ROTATED from XLA — at MQA
            # it is a (B, S, D) tensor 16x smaller than q, so its XLA
            # rotate pass costs microseconds while fusing it here would
            # re-rotate it per visit
            rows = fold * bq
            q = q_ref[0].reshape(rows, q_ref.shape[-1])
            qrot_ref[:] = q * cq_ref[:] + _rot_half(q) * sq_ref[:]

    virtual = (i * bq - window // 2) // bk + j if window is not None else j
    valid = jnp.logical_and(virtual >= 0, virtual < nk) if window is not None else (j >= 0)

    def _update(apply_mask):
        def body():
            rows = fold * bq
            if rope:
                # fused rotary embedding for q: the whole-tensor rotate-half
                # read/write passes over the (B, T, H, D) q in HBM disappear.
                # The q tables arrive PRE-EXPANDED to row space (row r =
                # t*fold+h -> table row t, a constant-folded jnp.repeat
                # outside) and carry the softmax scale; the rotation itself
                # ran once at j == 0 (scratch above)
                q = qrot_ref[:]
            else:
                q = q_ref[0].reshape(rows, q_ref.shape[-1])  # (bq*H, D), seq-major
            k = k_ref[0]  # (bk, D)
            v = v_ref[0]

            # fast (forward-only) mode keeps the logits/probabilities in
            # bf16: the VPU packs 2 bf16 lanes per f32 lane and the l-sum
            # still accumulates in f32. Softmax stats stay f32 in scratch.
            # ~1e-3 relative output error vs the exact path — in line with
            # the bf16 matmuls around it.
            s_dtype = jnp.bfloat16 if fast else jnp.float32
            # Mosaic requires a 32-bit matmul accumulator; the cast applies
            # on the way out of the acc registers (no separate scale pass:
            # scale*log2e is folded into q)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            s = s.astype(s_dtype)
            if apply_mask:
                s = _masked(s, i * bq, virtual * bk, window, fold)

            m_prev = m_ref[:]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True).astype(jnp.float32))
            p = jnp.exp2(s - m_new.astype(s_dtype))
            correction = jnp.exp2(m_prev - m_new)
            l_new = correction * l_ref[:] + jnp.sum(p, axis=1, keepdims=True, dtype=jnp.float32)

            pv = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            acc_ref[:] = acc_ref[:] * correction + pv
            m_ref[:] = m_new
            l_ref[:] = l_new

        return body

    if window is None:
        pl.when(valid)(_update(False))
    else:
        # a KV block wholly inside every row's +/- window/2 span needs no
        # masking at all — at full-song lengths most visited blocks are
        # interior, and the mask's compare/select passes over the whole
        # (rows, bk) chunk roughly double the windowed kernel's VPU work
        w2 = window // 2
        interior = jnp.logical_and(
            virtual * bk + (bk - 1) - i * bq <= w2,
            i * bq + (bq - 1) - virtual * bk <= w2,
        )
        pl.when(jnp.logical_and(valid, interior))(_update(False))
        pl.when(jnp.logical_and(valid, jnp.logical_not(interior)))(_update(True))

    @pl.when(j == n_visit - 1)
    def _finalize():
        l = l_ref[:]
        o = (acc_ref[:] / l).astype(o_ref.dtype)
        o_ref[0] = o.reshape(o_ref.shape[1:])
        # BASE-2 LSE for the backward: logits were base-2 and the backward
        # kernels stay in the exp2 domain end to end
        lse = m_ref[:] + jnp.log2(l)  # (rows, 1)
        if dense:  # dense = the stats block's row-group size g, 0 when padded
            rows = fold * bq
            lse_ref[(b * nq + i) % dense] = lse.reshape(rows)
        else:
            lse_ref[0] = lse


def _dense_stats_group(B: int, nq: int, rows: int) -> int:
    """Block row-count for the DENSE lane-major (B*nq, rows) softmax-stat
    layout, or 0 when only the padded layout works. The alternative —
    (B, QR, 1) with (rows, 1) blocks — lane-pads 128x in HBM: at the
    production config that is a 134 MB transient per level-0 site and a
    256 KB (instead of 2 KB amortized) stats DMA per backward visit.

    Pallas needs the block's sublane dim divisible by 8 OR equal to the
    array dim, so: (8, rows) groups when the flattened q-block count divides
    8; otherwise ONE whole-array block — resident in VMEM for the entire
    kernel — when it fits a 2 MB budget (the full-song inference shape,
    nq=354, lands here)."""
    if (B * nq) % 8 == 0:
        return 8
    if B * nq * rows * 4 <= (2 << 20):
        return B * nq
    return 0


def _dense_stats_ok(B: int, nq: int, rows: int = 8) -> bool:
    return _dense_stats_group(B, nq, rows) > 0


def _flash_fwd(q, k, v, fold, bq, bk, window, fast=False, rope=None, dense=False):
    """q: seq-major (B, T, H, D); k/v: (B, S, D) rank-3 MQA. Without ``rope``
    q must arrive PRE-SCALED by scale*log2e. With ``rope`` = (cos_q, sin_q)
    row-expanded q tables (carrying the scale*log2e factor), q arrives raw
    and the kernel rotates it in VMEM once per block; k must arrive ALREADY
    rotated (its XLA pass is tiny at MQA size).
    Returns (o, lse); lse is dense lane-major (B*nq, rows) with ``dense``
    (requires ``_dense_stats_ok``), else the padded ``_stats_shape`` layout.
    Both are row-major over the same flat (B, T*fold) index, so reshapes
    between them (and across different block choices) are free."""
    B, T, H, D = q.shape
    S = k.shape[1]
    rows = fold * bq
    nq = T // bq
    nk = S // bk
    dense_g = _dense_stats_group(B, nq, rows) if dense else 0
    assert not dense or dense_g
    n_visit = _span_visits(window, bq, bk, nk)
    local = window is not None

    def kv_index(b, i, j):
        jj = jnp.clip((i * bq - window // 2) // bk + j, 0, nk - 1) if local else j
        return (b, jj, 0)

    def q_table_index(b, i, j):
        return (i, 0)  # on the row-expanded (T*fold, D) q tables

    kernel = functools.partial(
        _fwd_kernel, bq=bq, bk=bk, nk=nk, nq=nq, fold=fold, window=window, fast=fast,
        rope=rope is not None, dense=dense_g,
    )

    in_specs = [
        pl.BlockSpec((1, bq, H, D), lambda b, i, j: (b, i, 0, 0)),
        pl.BlockSpec((1, bk, D), kv_index),
        pl.BlockSpec((1, bk, D), kv_index),
    ]
    operands = [q, k, v]
    scratch = [
        pltpu.VMEM((rows, D), jnp.float32),
        pltpu.VMEM((rows, 1), jnp.float32),
        pltpu.VMEM((rows, 1), jnp.float32),
    ]
    if rope is not None:
        cos_q, sin_q = rope  # q tables row-expanded (T*fold, D)
        in_specs += [
            pl.BlockSpec((rows, D), q_table_index),
            pl.BlockSpec((rows, D), q_table_index),
        ]
        operands += [cos_q, sin_q]
        scratch.append(pltpu.VMEM((rows, D), q.dtype))  # rotated-q block

    if dense:
        g = dense_g
        lse_spec = pl.BlockSpec((g, rows), lambda b, i, j: ((b * nq + i) // g, 0))
        lse_shape = jax.ShapeDtypeStruct((B * nq, rows), jnp.float32)
        # the (g, rows) lse block collects rows from g CONSECUTIVE q blocks,
        # so the q-block grid dim must iterate in order: "arbitrary", not
        # "parallel" (sequential on a single TensorCore either way); when one
        # block spans ALL q blocks (whole-array resident), b too
        semantics = (
            "arbitrary" if g > nq else "parallel",
            "arbitrary",
            "arbitrary",
        )
    else:
        lse_spec = pl.BlockSpec((1, rows, 1), lambda b, i, j: (b, i, 0))
        lse_shape = jax.ShapeDtypeStruct(_stats_shape(B, nq, rows), jnp.float32)
        semantics = ("parallel", "parallel", "arbitrary")
    o, lse = pl.pallas_call(
        kernel,
        grid=(B, nq, n_visit),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, bq, H, D), lambda b, i, j: (b, i, 0, 0)),
            lse_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, H, D), q.dtype),
            lse_shape,
        ],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(dimension_semantics=semantics),
    )(*operands)
    return o, lse


# ---------------------------------------------------------------- backward


def _dq_kernel(*refs, bq, bk, nk, nq, fold, window, rope, dense):
    """Split dq kernel (windowed sites). With ``rope`` q arrives RAW plus its
    scale-carrying cos/sin table blocks: rotated once per q block into VMEM
    scratch (it is pinned across the kv sweep), and the finished dq is
    un-rotated IN-REGISTER at finalize so it lands in the raw q's frame.
    With ``dense`` the softmax stats arrive as lane-major (g, rows) blocks
    (one in-register row relayout per q block instead of a 128x lane-padded
    (rows, 1) DMA per block — see _dense_stats_group)."""
    if rope:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, cq_ref, sq_ref,
         dq_ref, dq_acc, qrot_ref) = refs
    else:
        q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, dq_acc = refs
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    n_visit = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)
        if rope:
            rows = fold * bq
            qr = q_ref[0].reshape(rows, q_ref.shape[-1])
            qrot_ref[:] = qr * cq_ref[:] + _rot_half(qr) * sq_ref[:]

    virtual = (i * bq - window // 2) // bk + j if window is not None else j
    valid = jnp.logical_and(virtual >= 0, virtual < nk) if window is not None else (j >= 0)

    @pl.when(valid)
    def _update():
        rows = fold * bq
        D = q_ref.shape[-1]
        q = qrot_ref[:] if rope else q_ref[0].reshape(rows, D)
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0].reshape(rows, D)
        # base-2 LSE shifted by -log2(ln2) on its (rows, 1) block:
        # exp2(s - lse) = ln2 * p, which IS the ds chain-rule constant
        # (s_e = ln2 * s_2) — so the whole dq path runs without a single
        # full-chunk scale pass
        if dense:  # dense = the stats block's row-group size g, 0 when padded
            row = (b * nq + i) % dense
            lse = lse_ref[row].reshape(rows, 1) - math.log2(LN2)
            delta = delta_ref[row].reshape(rows, 1)
        else:
            lse = lse_ref[0] - math.log2(LN2)
            delta = delta_ref[0]

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        s = _masked(s, i * bq, virtual * bk, window, fold)
        p_ln2 = jnp.exp2(s - lse)  # = ln2 * softmax probability

        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        ds = p_ln2 * (dp - delta)  # d(loss)/d(q'.k); q prescale folds the scale

        dq_acc[:] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(j == n_visit - 1)
    def _finalize():
        # already in the PRE-SCALED q's frame incl. the ln2 chain-rule
        # factor (folded into the lse shift above): emitted final
        dq = dq_acc[:]
        if rope:
            # adjoint of the q rotation, in-register (scale-carrying tables):
            # the write below lands directly in the RAW q's frame
            dq = _unrotate(dq, cq_ref[:].astype(jnp.float32), sq_ref[:].astype(jnp.float32))
        dq_ref[0] = dq.astype(dq_ref.dtype).reshape(dq_ref.shape[1:])


def _dkv_kernel(*refs, bq, bk, nq, fold, window, rope, dense):
    """Split dkv kernel (windowed sites). With ``rope`` each visited q block
    is rotated in-register (q changes per visit, so no scratch reuse); dk
    leaves in the ROTATED frame and its un-rotation is a tiny XLA pass on the
    rank-3 MQA k. With ``dense`` the stats blocks follow the VISITED q block
    (dynamic block index + dynamic in-register row pick)."""
    if rope:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, cq_ref, sq_ref,
         dk_ref, dv_ref, dk_acc, dv_acc) = refs
    else:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
         dk_ref, dv_ref, dk_acc, dv_acc) = refs
    b = pl.program_id(0)
    jk = pl.program_id(1)  # kv block
    ii = pl.program_id(2)  # visited folded q block
    n_visit = pl.num_programs(2)

    @pl.when(ii == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    virtual = (jk * bk - window // 2) // bq + ii if window is not None else ii
    valid = jnp.logical_and(virtual >= 0, virtual < nq) if window is not None else (ii >= 0)

    @pl.when(valid)
    def _update():
        rows = fold * bq
        D = q_ref.shape[-1]
        q = q_ref[0].reshape(rows, D)
        if rope:
            q = q * cq_ref[:] + _rot_half(q) * sq_ref[:]
        k = k_ref[0]  # (bk, D)
        v = v_ref[0]
        do = do_ref[0].reshape(rows, D)
        if dense:
            # the fetched (g, rows) stats block contains the VISITED q block
            # jj's row (the index map clips like the q block's): pick it
            jj = jnp.clip(virtual, 0, nq - 1)
            row = (b * nq + jj) % dense
            lse = lse_ref[row].reshape(rows, 1)  # base-2
            delta = delta_ref[row].reshape(rows, 1)
        else:
            lse = lse_ref[0]  # (rows, 1), base-2
            delta = delta_ref[0]

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        s = _masked(s, virtual * bq, jk * bk, window, fold)
        p = jnp.exp2(s - lse)  # exact probability: dv needs p unscaled

        # dv/dk accumulate over BOTH the q rows and the folded heads
        dv_acc[:] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        dk_acc[:] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(ii == n_visit - 1)
    def _finalize():
        # ln2 chain-rule factor (s_e = ln2 * q'.k) applied once per kv block
        # in VMEM, fused with the cast — no whole-tensor HBM scale pass
        dk_ref[0] = (dk_acc[:] * LN2).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _bwd_fused_kernel(
    *refs, bq, bk, nq, fold, rope, dense,
):
    """Fused backward for GLOBAL attention: one (kv-block, q-block) sweep
    computes dk, dv AND a per-kv-block dq partial. The split dq/dkv kernels
    each recompute the logits chunk and dp — 7 matmuls per block pair; this
    kernel shares them, doing the minimal 5 (s, dp, dv, dk, dq), a ~29% cut
    of the backward's MXU work. dq cannot be accumulated across the kv grid
    dimension race-free in VMEM, so each kv block emits its (B, T, H, D)
    partial into a (nk, ...) stack summed by one fused XLA pass outside —
    ~1 GB of extra HBM traffic (≈1 ms) for ~2 matmuls per pair (tens of ms).

    Everything stays in the exp2 domain: the LSE arrives base-2 and is
    shifted by -log2(ln2) once per (rows, 1) block, making exp2(s - lse')
    equal ln2·p — exactly the ds chain-rule constant (s_e = ln2·s_2). dk and
    dq then need no scale pass at all; dv divides the ln2 back out on its
    (bk, D) accumulator at finalize.

    With ``rope``, q arrives RAW plus its scale-carrying cos/sin table blocks
    (k arrives PRE-ROTATED from XLA — tiny at MQA size): the kernel rotates
    q in-register to reproduce the forward's logits exactly, and un-rotates
    each dq partial in-register before writing it (free under the MXU
    shadow), so the XLA stack-sum lands directly in the RAW q's frame;
    dk leaves rotated and its un-rotation is a tiny XLA pass."""
    if rope:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, cq_ref, sq_ref,
         dk_ref, dv_ref, dqp_ref, dk_acc, dv_acc) = refs
    else:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
         dk_ref, dv_ref, dqp_ref, dk_acc, dv_acc) = refs
    b = pl.program_id(0)
    ii = pl.program_id(2)  # q block (inner sweep)
    n_visit = pl.num_programs(2)

    @pl.when(ii == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    rows = fold * bq
    D = q_ref.shape[-1]
    q = q_ref[0].reshape(rows, D)
    if rope:
        q = q * cq_ref[:] + _rot_half(q) * sq_ref[:]
    k = k_ref[0]  # (bk, D)
    v = v_ref[0]
    do = do_ref[0].reshape(rows, D)
    if dense:  # dense = the stats block's row-group size g, 0 when padded
        # one lane-major row of the (g, rows) stats block -> (rows, 1): the
        # in-register relayout replaces a 256 KB lane-padded DMA per visit
        row = (b * nq + ii) % dense
        lse = lse_ref[row].reshape(rows, 1) - math.log2(LN2)
        delta = delta_ref[row].reshape(rows, 1)
    else:
        lse = lse_ref[0] - math.log2(LN2)  # (rows, 1): exp2(s - lse') = ln2 * p
        delta = delta_ref[0]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    p_ln2 = jnp.exp2(s - lse)  # = ln2 * softmax probability

    dv_acc[:] += jax.lax.dot_general(
        p_ln2.astype(do.dtype), do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p_ln2 * (dp - delta)  # ln2-scaled ds: dk and dq use it unscaled
    dk_acc[:] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dqp = jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    if rope:
        # un-rotate the dq partial in-register (f32, scale-carrying q tables):
        # free under the MXU shadow, and the XLA stack-sum outside then yields
        # dq directly in the RAW q's frame. (Un-rotating AFTER the sum in XLA
        # was measured ~1 ms/site slower: the f32 sum materializes and the
        # rotate-half slices break its output fusion.)
        dqp = _unrotate(dqp, cq_ref[:].astype(jnp.float32), sq_ref[:].astype(jnp.float32))
    dqp_ref[0, 0] = dqp.astype(dqp_ref.dtype).reshape(dqp_ref.shape[2:])

    @pl.when(ii == n_visit - 1)
    def _finalize():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = (dv_acc[:] * (1.0 / LN2)).astype(dv_ref.dtype)


def _flash_bwd_fused(fold, bq, bk, res, g, rope=None, dense=False):
    """Global-attention backward via the fused kernel; see _bwd_fused_kernel.
    With ``rope`` = (cos_q, sin_q, ck, sk) tables (q tables row-expanded
    and scale-carrying, exactly the forward's), q/k in ``res`` are RAW.

    Block sizes are FREE of the forward's choice: the lse/delta residual is
    flat (B, T*fold) in t-major order — row r of q block i sits at
    i*rows + r = fold*t + h for ANY bq — so the backward re-blocks it
    however it likes. The backward holds three (rows, bk) f32 chunks at
    once; (bq=32 -> rows=512, bk=1024) fits that budget while HALVING both
    the dq-partial stack depth (nk) and the number of q/do re-reads vs the
    (64, 512) the forward would imply — measured faster at every production
    shape (see scripts/attn_microbench.py)."""
    q, k, v, o, lse = res
    do, _ = g
    B, T, H, D = q.shape
    S = k.shape[1]
    import os

    bwd_bq = int(os.environ.get("OSUFUSION_BWD_BQ", 0))
    bwd_bk = int(os.environ.get("OSUFUSION_BWD_BK", 0))
    # default: halve block_q (wider-than-tall chunks keep VMEM flat) and use
    # the widest tileable block_k up to 1024
    bq = _pick_block(T, bwd_bq or max(32, bq // 2)) or bq
    bk = _pick_block(S, bwd_bk or 1024) or min(bk, 512)
    rows = fold * bq
    nq = T // bq
    nk = S // bk
    dense_g = _dense_stats_group(B, nq, rows) if dense else 0
    dense = dense_g > 0

    delta_flat = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    if dense:
        # lse arrived dense (B*nq_f, rows_f); both it and delta reshape FREELY
        # to this call's blocking (same flat (B, T*fold) row-major order)
        g = dense_g
        lse_op = lse.reshape(B * nq, rows)
        delta_op = delta_flat.reshape(B * nq, rows)
        stats_spec = pl.BlockSpec((g, rows), lambda b, jk, ii: ((b * nq + ii) // g, 0))
    else:
        # padded-column layout; if the residual came in dense, re-expand
        lse_op = lse.reshape(_stats_shape(B, nq, rows)[:-1])[..., None]
        delta_op = delta_flat.reshape(_stats_shape(B, nq, rows))
        stats_spec = pl.BlockSpec((1, rows, 1), lambda b, jk, ii: (b, ii, 0))
    in_specs = [
        pl.BlockSpec((1, bq, H, D), lambda b, jk, ii: (b, ii, 0, 0)),
        pl.BlockSpec((1, bk, D), lambda b, jk, ii: (b, jk, 0)),
        pl.BlockSpec((1, bk, D), lambda b, jk, ii: (b, jk, 0)),
        pl.BlockSpec((1, bq, H, D), lambda b, jk, ii: (b, ii, 0, 0)),
        stats_spec,
        stats_spec,
    ]
    operands = [q, k, v, do, lse_op, delta_op]
    if rope is not None:
        q_table_spec = pl.BlockSpec((rows, D), lambda b, jk, ii: (ii, 0))
        in_specs += [q_table_spec, q_table_spec]
        operands += list(rope)  # (cos_q, sin_q) row-expanded, scale-carrying

    dk, dv, dq_parts = pl.pallas_call(
        functools.partial(
            _bwd_fused_kernel, bq=bq, bk=bk, nq=nq, fold=fold, rope=rope is not None, dense=dense_g
        ),
        grid=(B, nk, nq),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, bk, D), lambda b, jk, ii: (b, jk, 0)),
            pl.BlockSpec((1, bk, D), lambda b, jk, ii: (b, jk, 0)),
            pl.BlockSpec((1, 1, bq, H, D), lambda b, jk, ii: (jk, b, ii, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, S, D), k.dtype),
            jax.ShapeDtypeStruct((B, S, D), v.dtype),
            # bf16 partials halve the stack's HBM traffic; the f32 upcast-sum
            # outside matches the split path's one-cast error envelope
            jax.ShapeDtypeStruct((nk, B, T, H, D), q.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, D), jnp.float32),
            pltpu.VMEM((bk, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
    )(*operands)

    dq = jnp.sum(dq_parts.astype(jnp.float32), axis=0).astype(q.dtype)
    return dq, dk, dv


def _flash_bwd(fold, bq, bk, window, res, g, rope=None, dense=False):
    if window is None:
        return _flash_bwd_fused(fold, bq, bk, res, g, rope=rope, dense=dense)
    q, k, v, o, lse = res
    do, _ = g
    B, T, H, D = q.shape
    S = k.shape[1]
    # the backward holds s, p, dp, ds chunks at once — cap its KV block at 512
    # to stay inside VMEM (the lse/delta row layout only depends on bq/fold,
    # so the backward's block width is free to differ from the forward's)
    bk = min(bk, 512)
    rows = fold * bq
    nq = T // bq
    nk = S // bk
    dense_g = _dense_stats_group(B, nq, rows) if dense else 0
    dense = dense_g > 0
    n_visit_k = _span_visits(window, bq, bk, nk)
    n_visit_q = _span_visits(window, bk, bq, nq)

    # per-row delta: a pure reshape of (B, T, H) into the stats layout
    delta_flat = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    if dense:
        # lane-major (B*nq, rows) stats — both the residual lse and delta
        # reshape FREELY (same flat (B, T*fold) t-major order); the kernels
        # pick their row in-register instead of paying the 128x lane-padded
        # (rows, 1) DMA per block (512 KB/visit at the full-song config)
        gr = dense_g
        lse_op = lse.reshape(B * nq, rows)
        delta_op = delta_flat.reshape(B * nq, rows)
        dq_stats_spec = pl.BlockSpec((gr, rows), lambda b, i, j: ((b * nq + i) // gr, 0))
    else:
        lse_op = lse.reshape(_stats_shape(B, nq, rows))
        delta_op = delta_flat.reshape(_stats_shape(B, nq, rows))
        dq_stats_spec = pl.BlockSpec((1, rows, 1), lambda b, i, j: (b, i, 0))

    def kv_index(b, i, j):
        return (b, jnp.clip((i * bq - window // 2) // bk + j, 0, nk - 1), 0)

    in_specs = [
        pl.BlockSpec((1, bq, H, D), lambda b, i, j: (b, i, 0, 0)),
        pl.BlockSpec((1, bk, D), kv_index),
        pl.BlockSpec((1, bk, D), kv_index),
        pl.BlockSpec((1, bq, H, D), lambda b, i, j: (b, i, 0, 0)),
        dq_stats_spec,
        dq_stats_spec,
    ]
    operands = [q, k, v, do, lse_op, delta_op]
    scratch = [pltpu.VMEM((rows, D), jnp.float32)]
    if rope is not None:
        q_table_spec = pl.BlockSpec((rows, D), lambda b, i, j: (i, 0))
        in_specs += [q_table_spec, q_table_spec]
        operands += list(rope)  # (cos_q, sin_q) row-expanded, scale-carrying
        scratch.append(pltpu.VMEM((rows, D), q.dtype))  # rotated-q block

    dq = pl.pallas_call(
        functools.partial(
            _dq_kernel, bq=bq, bk=bk, nk=nk, nq=nq, fold=fold, window=window,
            rope=rope is not None, dense=dense_g,
        ),
        grid=(B, nq, n_visit_k),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bq, H, D), lambda b, i, j: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, T, H, D), q.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
    )(*operands)

    def visited_q(b, jk, ii):
        return jnp.clip((jk * bk - window // 2) // bq + ii, 0, nq - 1)

    def q_index(b, jk, ii):
        return (b, visited_q(b, jk, ii), 0, 0)

    if dense:
        gr = dense_g
        dkv_stats_spec = pl.BlockSpec(
            (gr, rows), lambda b, jk, ii: ((b * nq + visited_q(b, jk, ii)) // gr, 0)
        )
    else:
        dkv_stats_spec = pl.BlockSpec(
            (1, rows, 1), lambda b, jk, ii: (b, visited_q(b, jk, ii), 0)
        )

    in_specs = [
        pl.BlockSpec((1, bq, H, D), q_index),
        pl.BlockSpec((1, bk, D), lambda b, jk, ii: (b, jk, 0)),
        pl.BlockSpec((1, bk, D), lambda b, jk, ii: (b, jk, 0)),
        pl.BlockSpec((1, bq, H, D), q_index),
        dkv_stats_spec,
        dkv_stats_spec,
    ]
    operands = [q, k, v, do, lse_op, delta_op]
    if rope is not None:
        q_table_spec = pl.BlockSpec((rows, D), lambda b, jk, ii: (visited_q(b, jk, ii), 0))
        in_specs += [q_table_spec, q_table_spec]
        operands += list(rope)

    dk, dv = pl.pallas_call(
        functools.partial(
            _dkv_kernel, bq=bq, bk=bk, nq=nq, fold=fold, window=window,
            rope=rope is not None, dense=dense_g,
        ),
        grid=(B, nk, n_visit_q),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, bk, D), lambda b, jk, ii: (b, jk, 0)),
            pl.BlockSpec((1, bk, D), lambda b, jk, ii: (b, jk, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, S, D), k.dtype),
            jax.ShapeDtypeStruct((B, S, D), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, D), jnp.float32),
            pltpu.VMEM((bk, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
    )(*operands)

    # chain-rule ln2 constants are already inside the kernels (dq via the
    # lse shift, dk in its finalize) — no whole-tensor scale passes here;
    # with rope, dk leaves ROTATED (the caller un-rotates the tiny rank-3 k)
    return dq, dk, dv


# ------------------------------------------------- sequence-parallel (halo)
#
# Kernels for WINDOWED attention over a sequence-sharded activation: each
# device holds a contiguous (B, T_local, H, D) slice of the global sequence
# and a HALO-EXTENDED KV slab (B, T_local + window, D) assembled by the
# caller with two ppermutes (window/2 frames from each neighbour — see
# parallel/sequence.py). Because the window is +/- window/2, a query never
# needs keys beyond the immediate neighbours' halo: full-song (65k-frame)
# training shards over the `seq` mesh axis with O(window) ICI traffic per
# layer instead of ring-attention's O(T) rotation.
#
# Coordinates: local query t sits at global g0 + t; halo slab index s holds
# global g0 - window/2 + s. The window term |t - (s - window/2)| <= window/2
# is device-independent; only the SEQUENCE-BOUNDS term (0 <= global < T)
# needs g0/T, which arrive as scalar-prefetch operands so one compiled
# kernel serves every device in the shard_map. Out-of-bounds halo positions
# (sequence edges, where the ppermute delivered zeros) are masked to
# NEG_INF; a visit that is fully masked leaves m at NEG_INF and p=exp2(0)=1
# garbage in the accumulator, but the first in-bounds visit (every row's own
# position is in-bounds) rescales by exp2(NEG_INF - m_real) = 0, scrubbing
# it exactly — the standard online-softmax self-healing.


def _halo_visits_fwd(window: int, bq: int, bk: int) -> int:
    """Halo-slab blocks visited per q block: rows of block at local p cover
    slab span [p, p + bq - 1 + window]."""
    period = math.lcm(bq, bk) // bq
    return max(
        (p + bq - 1 + window) // bk - p // bk + 1
        for p in (i * bq for i in range(period))
    )


def _halo_visits_bwd(window: int, bq: int, bk: int) -> int:
    """Local q blocks visited per halo-slab block: slab block at s0 is
    attended by local rows [s0 - window, s0 + bk - 1]."""
    period = math.lcm(bq, bk) // bk
    return max(
        (s + bk - 1) // bq - (s - window) // bq + 1
        for s in (j * bk for j in range(period))
    )


def _halo_mask(s, q_start, kext_start, window, fold, g0, tg):
    """Mask a (bq*fold, bk) logits chunk in the halo frame: the window term
    uses LOCAL coordinates (key slab index - window/2); the bounds term
    shifts by the device offset g0 (scalar-prefetched)."""
    rows = q_start + jax.lax.broadcasted_iota(jnp.int32, (s.shape[0], 1), 0) // fold
    cols = (
        kext_start
        - window // 2
        + jax.lax.broadcasted_iota(jnp.int32, (1, s.shape[1]), 1)
    )
    ok = jnp.abs(rows - cols) <= window // 2
    cols_g = cols + g0
    ok = jnp.logical_and(ok, jnp.logical_and(cols_g >= 0, cols_g < tg))
    return jnp.where(ok, s, NEG_INF)


def _halo_fwd_kernel(
    info_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, acc_ref, m_ref, l_ref,
    *, bq, bk, nk, fold, window,
):
    i = pl.program_id(1)
    j = pl.program_id(2)
    n_visit = pl.num_programs(2)
    g0 = info_ref[0]
    tg = info_ref[1]

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    virtual = (i * bq) // bk + j
    # n_visit is the max span over q-block offsets; when window % bk != 0 the
    # span VARIES with the offset and overflow visits would alias back into
    # real, in-window blocks (the index map clips) — double-counting them.
    # Bound by this block's own last needed slab block.
    valid = jnp.logical_and(
        virtual <= (i * bq + bq - 1 + window) // bk, virtual < nk
    )
    virtual = jnp.minimum(virtual, nk - 1)

    def _update(apply_mask):
        def body():
            rows = fold * bq
            q = q_ref[0].reshape(rows, q_ref.shape[-1])
            k = k_ref[0]
            v = v_ref[0]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            if apply_mask:
                s = _halo_mask(s, i * bq, virtual * bk, window, fold, g0, tg)
            m_prev = m_ref[:]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            p = jnp.exp2(s - m_new)
            correction = jnp.exp2(m_prev - m_new)
            l_new = correction * l_ref[:] + jnp.sum(p, axis=1, keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            acc_ref[:] = acc_ref[:] * correction + pv
            m_ref[:] = m_new
            l_ref[:] = l_new

        return body

    # interior fast path: slab block inside every row's window AND fully
    # in sequence bounds (the bounds leg is device-dependent, so dynamic)
    w2 = window // 2
    interior_window = jnp.logical_and(
        virtual * bk >= i * bq + bq - 1,
        virtual * bk + (bk - 1) <= i * bq + window,
    )
    base_g = g0 - w2 + virtual * bk
    interior = jnp.logical_and(
        interior_window, jnp.logical_and(base_g >= 0, base_g + bk <= tg)
    )
    pl.when(jnp.logical_and(valid, interior))(_update(False))
    pl.when(jnp.logical_and(valid, jnp.logical_not(interior)))(_update(True))

    @pl.when(j == n_visit - 1)
    def _finalize():
        l = l_ref[:]
        o = (acc_ref[:] / l).astype(o_ref.dtype)
        o_ref[0] = o.reshape(o_ref.shape[1:])
        lse_ref[0] = m_ref[:] + jnp.log2(l)


def _halo_flash_fwd(q, k_ext, v_ext, info, fold, bq, bk, window):
    B, T, H, D = q.shape
    S = k_ext.shape[1]
    rows = fold * bq
    nq = T // bq
    nk = S // bk
    n_visit = _halo_visits_fwd(window, bq, bk)

    def kv_index(b, i, j, info):
        return (b, jnp.minimum((i * bq) // bk + j, nk - 1), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nq, n_visit),
        in_specs=[
            pl.BlockSpec((1, bq, H, D), lambda b, i, j, info: (b, i, 0, 0)),
            pl.BlockSpec((1, bk, D), kv_index),
            pl.BlockSpec((1, bk, D), kv_index),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, H, D), lambda b, i, j, info: (b, i, 0, 0)),
            pl.BlockSpec((1, rows, 1), lambda b, i, j, info: (b, i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows, D), jnp.float32),
            pltpu.VMEM((rows, 1), jnp.float32),
            pltpu.VMEM((rows, 1), jnp.float32),
        ],
    )
    o, lse = pl.pallas_call(
        functools.partial(_halo_fwd_kernel, bq=bq, bk=bk, nk=nk, fold=fold, window=window),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, T, H, D), q.dtype),
            jax.ShapeDtypeStruct(_stats_shape(B, nq, rows), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
    )(info, q, k_ext, v_ext)
    return o, lse


def _halo_dq_kernel(
    info_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, dq_acc,
    *, bq, bk, nk, fold, window,
):
    i = pl.program_id(1)
    j = pl.program_id(2)
    n_visit = pl.num_programs(2)
    g0 = info_ref[0]
    tg = info_ref[1]

    @pl.when(j == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    virtual = (i * bq) // bk + j
    valid = jnp.logical_and(
        virtual <= (i * bq + bq - 1 + window) // bk, virtual < nk
    )
    virtual = jnp.minimum(virtual, nk - 1)

    @pl.when(valid)
    def _update():
        rows = fold * bq
        D = q_ref.shape[-1]
        q = q_ref[0].reshape(rows, D)
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0].reshape(rows, D)
        lse = lse_ref[0] - math.log2(LN2)  # exp2(s - lse') = ln2 * p (see _dq_kernel)
        delta = delta_ref[0]

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        s = _halo_mask(s, i * bq, virtual * bk, window, fold, g0, tg)
        p_ln2 = jnp.exp2(s - lse)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        ds = p_ln2 * (dp - delta)
        dq_acc[:] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(j == n_visit - 1)
    def _finalize():
        dq_ref[0] = dq_acc[:].astype(dq_ref.dtype).reshape(dq_ref.shape[1:])


def _halo_dkv_kernel(
    info_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    dk_acc, dv_acc, *, bq, bk, nq, fold, window,
):
    jk = pl.program_id(1)  # halo-slab block
    ii = pl.program_id(2)  # visited local q block
    n_visit = pl.num_programs(2)
    g0 = info_ref[0]
    tg = info_ref[1]

    @pl.when(ii == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    virtual = (jk * bk - window) // bq + ii  # local q block, may be out of range
    # in-range AND within this slab block's own span (see _halo_fwd_kernel on
    # variable spans when window % bq != 0)
    valid = jnp.logical_and(
        jnp.logical_and(virtual >= 0, virtual < nq),
        virtual <= (jk * bk + bk - 1) // bq,
    )

    @pl.when(valid)
    def _update():
        rows = fold * bq
        D = q_ref.shape[-1]
        q = q_ref[0].reshape(rows, D)
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0].reshape(rows, D)
        lse = lse_ref[0]  # base-2
        delta = delta_ref[0]

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        s = _halo_mask(s, virtual * bq, jk * bk, window, fold, g0, tg)
        p = jnp.exp2(s - lse)
        dv_acc[:] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        dk_acc[:] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(ii == n_visit - 1)
    def _finalize():
        dk_ref[0] = (dk_acc[:] * LN2).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _halo_flash_bwd(fold, bq, bk, window, res, g):
    q, k_ext, v_ext, info, o, lse = res
    lse = lse[..., None]
    do = g
    B, T, H, D = q.shape
    S = k_ext.shape[1]
    bk = min(bk, 512)
    rows = fold * bq
    nq = T // bq
    nk = S // bk
    n_visit_k = _halo_visits_fwd(window, bq, bk)
    n_visit_q = _halo_visits_bwd(window, bq, bk)

    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1).reshape(
        _stats_shape(B, nq, rows)
    )

    def kv_index(b, i, j, info):
        return (b, jnp.minimum((i * bq) // bk + j, nk - 1), 0)

    stats_spec = pl.BlockSpec((1, rows, 1), lambda b, i, j, info: (b, i, 0))

    dq = pl.pallas_call(
        functools.partial(_halo_dq_kernel, bq=bq, bk=bk, nk=nk, fold=fold, window=window),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, nq, n_visit_k),
            in_specs=[
                pl.BlockSpec((1, bq, H, D), lambda b, i, j, info: (b, i, 0, 0)),
                pl.BlockSpec((1, bk, D), kv_index),
                pl.BlockSpec((1, bk, D), kv_index),
                pl.BlockSpec((1, bq, H, D), lambda b, i, j, info: (b, i, 0, 0)),
                stats_spec,
                stats_spec,
            ],
            out_specs=pl.BlockSpec((1, bq, H, D), lambda b, i, j, info: (b, i, 0, 0)),
            scratch_shapes=[pltpu.VMEM((rows, D), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((B, T, H, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
    )(info, q, k_ext, v_ext, do, lse, delta)

    def q_index(b, jk, ii, info):
        jj = jnp.clip((jk * bk - window) // bq + ii, 0, nq - 1)
        return (b, jj, 0, 0)

    def stats_index(b, jk, ii, info):
        jj = jnp.clip((jk * bk - window) // bq + ii, 0, nq - 1)
        return (b, jj, 0)

    dk, dv = pl.pallas_call(
        functools.partial(_halo_dkv_kernel, bq=bq, bk=bk, nq=nq, fold=fold, window=window),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, nk, n_visit_q),
            in_specs=[
                pl.BlockSpec((1, bq, H, D), q_index),
                pl.BlockSpec((1, bk, D), lambda b, jk, ii, info: (b, jk, 0)),
                pl.BlockSpec((1, bk, D), lambda b, jk, ii, info: (b, jk, 0)),
                pl.BlockSpec((1, bq, H, D), q_index),
                pl.BlockSpec((1, rows, 1), stats_index),
                pl.BlockSpec((1, rows, 1), stats_index),
            ],
            out_specs=[
                pl.BlockSpec((1, bk, D), lambda b, jk, ii, info: (b, jk, 0)),
                pl.BlockSpec((1, bk, D), lambda b, jk, ii, info: (b, jk, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((bk, D), jnp.float32),
                pltpu.VMEM((bk, D), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, S, D), k_ext.dtype),
            jax.ShapeDtypeStruct((B, S, D), v_ext.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
    )(info, q, k_ext, v_ext, do, lse, delta)

    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _halo_attention_core(q, k_ext, v_ext, info, fold, bq, bk, window):
    o, _ = _halo_flash_fwd(q, k_ext, v_ext, info, fold, bq, bk, window)
    return o


def _halo_fwd_rule(q, k_ext, v_ext, info, fold, bq, bk, window):
    o, lse = _halo_flash_fwd(q, k_ext, v_ext, info, fold, bq, bk, window)
    # named for the "save-attn-out" remat policy (see _fwd_rule): the
    # seq-sharded halo sites get the same save-outputs-only treatment
    o = checkpoint_name(o, "flash_o")
    lse = checkpoint_name(lse[..., 0], "flash_lse")
    return o, (q, k_ext, v_ext, info, o, lse)


def _halo_bwd_rule(fold, bq, bk, window, res, g):
    dq, dk, dv = _halo_flash_bwd(fold, bq, bk, window, res, g)
    info = res[3]
    return dq, dk, dv, np.zeros(info.shape, jax.dtypes.float0)


_halo_attention_core.defvjp(_halo_fwd_rule, _halo_bwd_rule)


def halo_flash_attention(
    q: jnp.ndarray,  # (B, T_local, H, D) — local query shard
    k_ext: jnp.ndarray,  # (B, T_local + window, D) — halo-extended keys
    v_ext: jnp.ndarray,  # (B, T_local + window, D)
    window: int,
    g0: jnp.ndarray,  # scalar int32: this shard's global start offset
    t_global: int,  # full sequence length
) -> jnp.ndarray:
    """Windowed flash attention on one sequence shard with neighbour halos
    (see parallel/sequence.py for the shard_map caller). q arrives RAW; the
    softmax/exp2 scale is folded here like the single-chip path."""
    B, T, H, D = q.shape
    bq, bk, fold = _choose_blocks(T, k_ext.shape[1], H)
    assert bq and bk, f"untileable halo shape T={T} S={k_ext.shape[1]}"
    assert window % 2 == 0 and k_ext.shape[1] == T + window
    q = q * jnp.asarray(D**-0.5 * LOG2E, q.dtype)
    info = jnp.stack([g0.astype(jnp.int32), jnp.int32(t_global)])
    return _halo_attention_core(q, k_ext, v_ext, info, fold, bq, bk, window)


# ---------------------------------------------------- sequence-parallel (ring)
#
# GLOBAL attention over a sequence-sharded activation — the regime the halo
# path cannot serve (window off / wider than the sequence: every query needs
# every key). Classic ring attention: each device keeps its q shard pinned
# while the KV chunks rotate around the mesh axis (wrap-around ppermute, one
# hop per step); each step runs the single-chip global forward kernel on
# (q_local, kv_chunk) and the per-chunk outputs are merged by the EXACT
# online-softmax rule on their base-2 LSEs — so the n-device result matches
# the single-chip global kernel bit-for-intent, per-device memory stays
# O(T_local * D), and the ICI traffic is the O(T) rotation (vs the halo
# path's O(window), which is why the dispatch prefers halos whenever the
# window is engaged; see parallel/ring.py and ops/attention.py).
#
# The backward is a second ring pass reusing the fused one-sweep backward
# kernel per chunk with the GLOBAL lse/delta (which makes each chunk's
# probabilities globally correct): dq accumulates locally across steps, while
# the dk/dv accumulators TRAVEL WITH their chunk — after n hops each chunk's
# accumulator arrives back at its home device holding every q shard's
# contribution. All cross-step accumulation is f32; casts to the activation
# dtype happen once at the end.


def _ring_stats_to_seq(w: jnp.ndarray, B: int, T: int, H: int) -> jnp.ndarray:
    """(B, nq*rows, 1) stats-layout weights -> (B, T, H, 1). Row r of q block
    i is (t = i*bq + r//fold, h = r%fold), so this is a pure reshape."""
    return w.reshape(B, T, H)[..., None]


def _ring_fwd(q, k, v, fold, bq, bk, axis_name, n):
    """q (B, T_local, H, D) PRE-SCALED; k/v (B, T_local, D). Returns
    (o, lse) like _flash_fwd, with lse the GLOBAL base-2 logsumexp."""
    B, T, H, D = q.shape
    perm = [(i, (i + 1) % n) for i in range(n)]

    def step(carry, _):
        k_cur, v_cur, o_acc, lse_acc = carry
        o_j, lse_j = _flash_fwd(q, k_cur, v_cur, fold, bq, bk, None)
        # exact merge of normalized partials: o = sum_j 2^(lse_j - LSE) o_j
        m = jnp.maximum(lse_acc, lse_j)
        lse_new = m + jnp.log2(jnp.exp2(lse_acc - m) + jnp.exp2(lse_j - m))
        w_acc = _ring_stats_to_seq(jnp.exp2(lse_acc - lse_new), B, T, H)
        w_j = _ring_stats_to_seq(jnp.exp2(lse_j - lse_new), B, T, H)
        o_acc = o_acc * w_acc + o_j.astype(jnp.float32) * w_j
        # the final hop returns the chunks home (unused by fwd, but it keeps
        # the step uniform; the bwd ring NEEDS all n hops for its dk/dv)
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return (k_nxt, v_nxt, o_acc, lse_new), None

    nq = T // bq
    o0 = jnp.zeros((B, T, H, D), jnp.float32)
    lse0 = jnp.full(_stats_shape(B, nq, fold * bq), NEG_INF, jnp.float32)
    (_, _, o, lse), _ = jax.lax.scan(step, (k, v, o0, lse0), None, length=n)
    return o.astype(q.dtype), lse


def _ring_bwd(fold, bq, bk, axis_name, n, res, g):
    q, k, v, o, lse = res  # lse squeezed (B, QR), base-2, GLOBAL
    do = g

    perm = [(i, (i + 1) % n) for i in range(n)]

    def step(carry, _):
        k_cur, v_cur, dk_cur, dv_cur, dq_acc = carry
        dq_j, dk_j, dv_j = _flash_bwd_fused(
            fold, bq, bk, (q, k_cur, v_cur, o, lse), (do, None)
        )
        dq_acc = dq_acc + dq_j.astype(jnp.float32)
        dk_cur = dk_cur + dk_j.astype(jnp.float32)
        dv_cur = dv_cur + dv_j.astype(jnp.float32)
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        dk_nxt = jax.lax.ppermute(dk_cur, axis_name, perm)
        dv_nxt = jax.lax.ppermute(dv_cur, axis_name, perm)
        return (k_nxt, v_nxt, dk_nxt, dv_nxt, dq_acc), None

    dq0 = jnp.zeros(q.shape, jnp.float32)
    dkv0 = jnp.zeros(k.shape, jnp.float32)
    (_, _, dk, dv, dq), _ = jax.lax.scan(
        step, (k, v, dkv0, dkv0, dq0), None, length=n
    )
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _ring_attention_core(q, k, v, fold, bq, bk, axis_name, n):
    o, _ = _ring_fwd(q, k, v, fold, bq, bk, axis_name, n)
    return o


def _ring_fwd_rule(q, k, v, fold, bq, bk, axis_name, n):
    o, lse = _ring_fwd(q, k, v, fold, bq, bk, axis_name, n)
    return o, (q, k, v, o, lse[..., 0])


def _ring_bwd_rule(fold, bq, bk, axis_name, n, res, g):
    return _ring_bwd(fold, bq, bk, axis_name, n, res, g)


_ring_attention_core.defvjp(_ring_fwd_rule, _ring_bwd_rule)


def ring_flash_attention_local(
    q: jnp.ndarray,  # (B, T_local, H, D) — local query shard, RAW
    k: jnp.ndarray,  # (B, T_local, D) — local KV chunk (MQA rank-3)
    v: jnp.ndarray,  # (B, T_local, D)
    axis_name: str,
    n_shards: int,
) -> jnp.ndarray:
    """Per-device body for GLOBAL attention on a sequence-sharded mesh axis
    (the shard_map caller is parallel/ring.py). The softmax/exp2 scale is
    folded here like the single-chip path."""
    B, T, H, D = q.shape
    S = k.shape[1]
    if H == 1:
        # full-MHA slice: timestep-fold (see _choose_tfold) — ring attention
        # is global by construction, so the fold is exact; the core's merge
        # math runs entirely in the folded view and unfolds for free.
        bq, bk, fold = _choose_tfold(T, S)
        assert fold, f"untileable ring shard T={T} S={S}; guard with ring_available"
        q = q * jnp.asarray(D**-0.5 * LOG2E, q.dtype)
        q = q.reshape(B, T // fold, fold, D)
        o = _ring_attention_core(q, k, v, fold, bq, bk, axis_name, n_shards)
        return o.reshape(B, T, H, D)
    bq, bk, fold = _choose_blocks(T, S, H)
    assert bq and bk, f"untileable ring shard T={T} S={S}; guard with ring_available"
    q = q * jnp.asarray(D**-0.5 * LOG2E, q.dtype)
    return _ring_attention_core(q, k, v, fold, bq, bk, axis_name, n_shards)


# -------------------------------------------------------------- public API


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _flash_attention_seqmajor(q, k, v, fold, bq, bk, window, fast=False, dense=False):
    o, _ = _flash_fwd(q, k, v, fold, bq, bk, window, fast, dense=dense)
    return o


def _fwd_rule(q, k, v, fold, bq, bk, window, fast=False, dense=False):
    # the exact-softmax forward backs the residuals; fast mode is never
    # differentiated (samplers only), but keep bwd numerically consistent
    o, lse = _flash_fwd(q, k, v, fold, bq, bk, window, False, dense=dense)
    # the residual crossing fwd->bwd stays 2-D either way: lane-major
    # (B*nq, rows) when dense, squeezed (B, QR) otherwise (the (B, QR, 1)
    # column form would lane-pad 128x in HBM).
    # o/lse carry checkpoint names: under remat_mode="save-attn-out"
    # (nn/unet.py) the policy saves ONLY these — the backward then re-runs
    # the cheap q/kv projections but never the flash forward kernel itself
    # (its outputs being saved, the recompute jaxpr DCEs the kernel call).
    o = checkpoint_name(o, "flash_o")
    lse = checkpoint_name(lse if dense else lse[..., 0], "flash_lse")
    return o, (q, k, v, o, lse)


def _bwd_rule(fold, bq, bk, window, fast, dense, res, g):
    return _flash_bwd(fold, bq, bk, window, res, (g, None), dense=dense)


_flash_attention_seqmajor.defvjp(_fwd_rule, _bwd_rule)


def _rotate_rank3(x, cos, sin):
    """XLA-side rotary for the (B, S, D) MQA k — 16x smaller than q, so this
    whole-tensor pass costs microseconds where fusing it into the kernels
    would re-rotate it once per visited block."""
    d = x.shape[-1]
    rot = jnp.concatenate([-x[..., d // 2 :], x[..., : d // 2]], axis=-1)
    return x * cos.astype(x.dtype) + rot * sin.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def _flash_attention_rope(q, k, v, cq, sq, ck, sk, fold, bq, bk, window, dense=False):
    """Flash attention (global OR windowed) with the q-side rotary embedding
    fused into BOTH the forward and backward kernels: q arrives RAW, its
    tables carry scale*log2e (exactly the inference fused-RoPE contract,
    _flash_fwd), the forward rotates it once per block into VMEM scratch,
    and the backward reproduces the logits the same way, emitting
    rotated-frame gradients that XLA un-rotates in fused epilogues
    (dq un-rotates IN-REGISTER in both the fused and the split-dq kernels).
    k (MQA-small) rotates in XLA. The whole-tensor rotate-half passes over
    the 16-head q — ~15 ms/step of pure HBM traffic at the production
    config (round-5 trace) — disappear."""
    k_rot = _rotate_rank3(k, ck, sk)
    o, _ = _flash_fwd(q, k_rot, v, fold, bq, bk, window, fast=False, rope=(cq, sq), dense=dense)
    return o


def _rope_fwd_rule(q, k, v, cq, sq, ck, sk, fold, bq, bk, window, dense=False):
    k_rot = _rotate_rank3(k, ck, sk)
    o, lse = _flash_fwd(q, k_rot, v, fold, bq, bk, window, fast=False, rope=(cq, sq), dense=dense)
    # named for the "save-attn-out" remat policy (see _fwd_rule)
    o = checkpoint_name(o, "flash_o")
    lse = checkpoint_name(lse if dense else lse[..., 0], "flash_lse")
    return o, (q, k_rot, v, o, lse, cq, sq, ck, sk)


def _rope_bwd_rule(fold, bq, bk, window, dense, res, g):
    q, k_rot, v, o, lse, cq, sq, ck, sk = res
    dq, dk_rot, dv = _flash_bwd(
        fold, bq, bk, window, (q, k_rot, v, o, lse), (g, None), rope=(cq, sq), dense=dense
    )
    # adjoint of k's XLA rotation back into the RAW k's frame (tiny tensor)
    dk = _unrotate(
        dk_rot.astype(jnp.float32), ck.astype(jnp.float32), sk.astype(jnp.float32)
    ).astype(dk_rot.dtype)
    # table grads: the tables are trace-time constants (rope.py) — zero
    # cotangents keep the vjp signature honest and DCE away under jit
    zt = lambda t: jnp.zeros_like(t)
    return dq, dk, dv, zt(cq), zt(sq), zt(ck), zt(sk)


_flash_attention_rope.defvjp(_rope_fwd_rule, _rope_bwd_rule)


def flash_attention_available(t: int, s: int, d: int, h: int = 1, kv: int = 1) -> bool:
    """Can the kernel tile this shape? Requires a lane-friendly head dim and
    block-divisible sequence lengths. kv > 1 (GQA/MHA) is served by slicing
    into per-KV-head MQA calls (see ``flash_attention``)."""
    return d % 64 == 0 and h % max(kv, 1) == 0 and _pick_block(t, 512) > 0 and _pick_block(s, 512) > 0


def flash_attention(
    q: jnp.ndarray,  # (B, T, H, D)
    k: jnp.ndarray,  # (B, S, Kv, D)
    v: jnp.ndarray,  # (B, S, Kv, D)
    window: Optional[int] = None,
    rope: Optional[tuple] = None,  # (cos, sin) tables (T, D); q/k arrive unroped
) -> jnp.ndarray:
    """Sequence-major MQA flash attention, optionally windowed. Returns
    (B, T, H, D). This is the kernel's NATIVE layout — the (B, T, H*D)
    outputs of the QKV projections reshape into it for free, so the whole
    attention path runs without a single XLA-side transpose; the softmax
    scale and exp2-domain factor fuse into the rotary-embedding pass (which
    itself runs INSIDE the kernel on the forward-only inference path)."""
    B, T, H, D = q.shape
    S, Kv = k.shape[1], k.shape[2]
    assert H % Kv == 0
    if Kv != 1:
        # GQA: run the MQA kernel once per KV head on its contiguous slice of
        # query heads (heads [g*group, (g+1)*group) share KV head g). Two
        # slice/concat passes over q/o per call — still O(T*D) memory where
        # the XLA einsum fallback materializes O(T^2) logits (4+ GB per DiT
        # site at the production context).
        group = H // Kv
        outs = [
            flash_attention(
                q[:, :, g * group : (g + 1) * group, :], k[:, :, g : g + 1, :],
                v[:, :, g : g + 1, :], window, rope,
            )
            for g in range(Kv)
        ]
        return jnp.concatenate(outs, axis=2)
    bq, bk, fold = _choose_blocks(T, S, H)
    if window is not None and S <= window:
        window = None  # window covers the whole sequence: run the global path
    tfold = 1
    if H == 1:
        # Full-MHA sites (DiT/MMDiT; reference dit.py:162) arrive here as
        # per-head MQA slices: timestep-fold them (see _choose_tfold).
        # Window masking DOES map rows to positions (via r//fold), so
        # windowed single-head-group sites (no model family has them: UNet
        # windowed sites are MQA/GQA with group = heads/kv_heads > 1) and
        # untileable lengths fall back to the XLA einsum.
        bq2, bk2, f = _choose_tfold(T, S) if window is None else (0, 0, 0)
        if not f:
            from osufusion_tpu.ops.attention import gqa_attention
            if rope is not None:
                from osufusion_tpu.ops.rope import apply_rope

                q = apply_rope(q, *rope)
                k = apply_rope(k, *rope)
            return gqa_attention(q, k, v, window=window)
        tfold, bq, bk, fold = f, bq2, bk2, f
    assert bq and bk, f"untileable shape T={T} S={S}; guard with flash_attention_available"

    scale = D**-0.5 * LOG2E
    fuse_rope = rope is not None and T == S
    if fuse_rope:
        # fuse the rotary embedding into the kernel — the whole-tensor
        # rotate-half read/write passes over q and k disappear. The q tables
        # absorb the softmax/exp2 scale (tables are tiny). On the training
        # path the fused (global) or split (windowed) backward kernels
        # rotate q in-register and un-rotate dq in-register
        # (_flash_attention_rope -> _flash_bwd).
        # The table blocks + rotate temporaries need VMEM headroom: halve the
        # folded rows vs the plain config.
        cos, sin = rope
        if tfold > 1:
            # timestep fold: kernel row r of q block i IS timestep
            # i*bq*fold + r, so the plain (T, D) tables blocked at
            # (rows, D) already line up row-for-row — no repeat.
            bq = _pick_block(T // tfold, max(64, 1024 // tfold))
            q_tables = ((cos * scale).astype(q.dtype), (sin * scale).astype(q.dtype))
            q = q.reshape(B, T // tfold, tfold, D)
        else:
            bq = _pick_block(T, max(64, 1024 // H))
            # q tables: row-expanded to (T*fold, D) — row r = t*fold + h
            # maps to table row t — and carrying the softmax/exp2 scale.
            # Tables are trace-time constants, so XLA folds the repeat once.
            q_tables = (
                jnp.repeat((cos * scale).astype(q.dtype), fold, axis=0),
                jnp.repeat((sin * scale).astype(q.dtype), fold, axis=0),
            )
        ck, sk = cos.astype(k.dtype), sin.astype(k.dtype)
        # dense lane-major softmax stats whenever the layout tiles
        # (_dense_stats_group) — on every path: the global fused backward,
        # the windowed split backward (dynamic-row picks) and forward-only
        # inference (whose lse is discarded; the padded write alone is
        # ~185 MB per site per sampler step at the fullsong length)
        dense = _dense_stats_ok(B, q.shape[1] // bq, fold * bq)
        if _INFERENCE.get():
            k_rot = _rotate_rank3(k.reshape(B, S, D), ck, sk)
            o, _ = _flash_fwd(
                q, k_rot, v.reshape(B, S, D), fold, bq, bk, window,
                fast=True, rope=q_tables, dense=dense,
            )
        else:
            o = _flash_attention_rope(
                q, k.reshape(B, S, D), v.reshape(B, S, D), *q_tables, ck, sk,
                fold, bq, bk, window, dense,
            )
        return o.reshape(B, T, H, D) if tfold > 1 else o
    if rope is not None:
        from osufusion_tpu.ops.rope import apply_rope

        q = apply_rope(q, *rope)
        k = apply_rope(k, *rope)

    q = q * jnp.asarray(scale, q.dtype)
    if tfold > 1:
        q = q.reshape(B, T // tfold, tfold, D)
    # see the fused-rope branch: dense stats engage on every path
    dense = _dense_stats_ok(B, q.shape[1] // bq, fold * bq)
    o = _flash_attention_seqmajor(
        q, k.reshape(B, S, D), v.reshape(B, S, D), fold, bq, bk, window, _INFERENCE.get(), dense
    )
    return o.reshape(B, T, H, D) if tfold > 1 else o

"""Flash attention for TPU in Pallas: the framework's centerpiece kernel.

Replaces the reference's CUDA flash-SDPA dependency (reference
osu_fusion/modules/attention.py:61-101) with a TPU-native tiled kernel:

- FlashAttention-2 style online softmax: the (T, S) logits matrix is never
  materialized — HBM traffic is O(T*D) instead of O(T^2);
- GROUP FOLDING for GQA/MQA: all query heads sharing a KV head are folded
  into the M dimension of one block, so the production MQA config (16 query
  heads, 1 KV head) runs 16 heads per program — KV is loaded from HBM once
  per group instead of once per head and the MXU sees (group*block_q, d)
  matmuls instead of 16 skinny ones. The fold happens INSIDE the kernel: q
  blocks are read head-major as (group, bq, d) and merged to (group*bq, d)
  in VMEM (a layout no-op), so no XLA-side fold/unfold copies of the big
  activations exist (~2 ms/site at the 23k-frame level-0 shape);
- base-2 softmax: scale*log2(e) is folded into q before the kernel, logits
  live in the exp2 domain and the VPU runs exp2 directly (saves the per
  element ln2 multiply and the separate scale pass over every logits chunk);
- optional LOCAL (sliding-window) attention: each query attends keys within
  +/- window/2 and the kernel only VISITS the KV blocks intersecting the
  window, with EXACT per-offset block spans — full-song (65k-frame) UNet
  levels drop from O(T^2) to O(T*W) FLOPs (SURVEY.md section 5.7);
- grid (batch, kv_head, q_block, kv_visit) with VMEM accumulator scratch
  carried across the innermost (sequential) dimension; softmax stats fp32;
- custom VJP with the standard recompute backward; thanks to folding, the
  dkv kernel accumulates the whole head group in-kernel and emits
  (B, Kv, S, D) directly (no per-head intermediate + reduction).

Falls back to the XLA einsum path for shapes the kernel doesn't tile
(sequence not a multiple of 128) and on non-TPU backends.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_K = 512
# folded Q rows per program (group * block_q); bounded by VMEM. Training needs
# headroom for the backward kernels' temporaries; inference (forward-only, see
# inference_attention()) can run double-size blocks, halving per-program
# overhead in samplers.
TARGET_FOLDED_ROWS = 2048
# 4096 rows exceeds the 16 MB VMEM budget even forward-only (the f32 QK
# accumulator is rows x bk x 4B); kept equal to training until a
# smaller-footprint softmax lands.
INFERENCE_FOLDED_ROWS = 2048
INFERENCE_BLOCK_K = 1024
NEG_INF = -1e30
LOG2E = math.log2(math.e)
LN2 = math.log(2.0)

_INFERENCE = __import__("contextvars").ContextVar("osufusion_flash_inference", default=False)


def inference_attention():
    """Trace-time hint: the enclosed computation is forward-only, so the
    kernel may use larger KV blocks / bf16 logits the backward could not."""
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
    for b in (preferred, 512, 256, 128):
        if b <= preferred and t % b == 0:
            return b
    return 0


def _pick_block_wide(t: int, preferred: int) -> int:
    for b in (preferred, 1024, 512, 256, 128):
        if b <= preferred and t % b == 0:
            return b
    return 0


def _choose_blocks(t: int, s: int, group: int) -> tuple[int, int]:
    """(block_q, block_k) given the fold group size."""
    rows = INFERENCE_FOLDED_ROWS if _INFERENCE.get() else TARGET_FOLDED_ROWS
    bq = _pick_block(t, max(128, rows // group))
    if _INFERENCE.get():
        # bf16 logits halve the per-chunk VMEM: double-wide KV blocks fit,
        # halving the visit count (and its per-visit fixed costs)
        bk = _pick_block_wide(s, INFERENCE_BLOCK_K)
    else:
        bk = _pick_block(s, DEFAULT_BLOCK_K)
    return bq, bk


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


def _fold_rows(x: jnp.ndarray, group: int, bq: int) -> jnp.ndarray:
    """(B, H, T, 1) -> (B, Kv, nq*group*bq, 1) in the kernels' folded row
    order (head f, q-block i, in-block t -> row offset f*bq + t of block i).

    Only used for the SMALL per-row tensors (lse, delta) consumed by the
    backward kernels; the big (.., D) activations never fold outside VMEM.
    """
    B, H, T, C = x.shape
    kv = H // group
    nq = T // bq
    return (
        x.reshape(B, kv, group, nq, bq, C).transpose(0, 1, 3, 2, 4, 5).reshape(B, kv, nq * group * bq, C)
    )


def _masked(s: jnp.ndarray, q_start, k_start, window: Optional[int], bq: int) -> jnp.ndarray:
    """Window-mask a (group*bq, bk) logits chunk; row position repeats per head."""
    if window is None:
        return s
    rows = q_start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) % bq
    cols = k_start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    return jnp.where(jnp.abs(rows - cols) <= window // 2, s, NEG_INF)


# ----------------------------------------------------------------- forward


def _fwd_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref, acc_ref, m_ref, l_ref, *, bq, bk, nk, group, window, fast
):
    """One (q-block, kv-visit) step. q_ref block is (1, group, bq, D) read
    straight from the head-major (B, H, T, D) array; the merge to
    (group*bq, D) rows is a VMEM no-op. Logits are in the exp2 domain
    (q pre-scaled by scale*log2e)."""
    i = pl.program_id(2)
    j = pl.program_id(3)
    n_visit = pl.num_programs(3)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    virtual = (i * bq - window // 2) // bk + j if window is not None else j
    valid = jnp.logical_and(virtual >= 0, virtual < nk) if window is not None else (j >= 0)

    @pl.when(valid)
    def _update():
        rows = group * bq
        q = q_ref[0].reshape(rows, q_ref.shape[-1])  # (group*bq, D), head-major
        k = k_ref[0, 0]  # (bk, D)
        v = v_ref[0, 0]

        # fast (forward-only) mode keeps the logits/probabilities in bf16:
        # the MXU emits bf16 directly (f32 accumulation internally), the VPU
        # packs 2 bf16 lanes per f32 lane, and the l-sum still accumulates in
        # f32. Softmax stats stay f32 in scratch. ~1e-3 relative output error
        # vs the exact path - in line with the bf16 matmuls around it.
        s_dtype = jnp.bfloat16 if fast else jnp.float32
        # Mosaic requires a 32-bit matmul accumulator; the cast applies on the
        # way out of the acc registers (no separate scale pass: scale*log2e is
        # folded into q)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        s = _masked(s.astype(s_dtype), i * bq, virtual * bk, window, bq)

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

    @pl.when(j == n_visit - 1)
    def _finalize():
        l = l_ref[:]
        o = (acc_ref[:] / l).astype(o_ref.dtype)
        o_ref[0] = o.reshape(o_ref.shape[1:])
        # natural-log LSE for the backward: logits were base-2
        lse_ref[0, 0] = (m_ref[:] + jnp.log2(l)) * LN2


def _flash_fwd(qh, k, v, group, bq, bk, window, fast=False):
    """qh: head-major (B, H, T, D), PRE-SCALED by scale*log2e; k/v: (B, Kv, S, D)."""
    B, H, T, D = qh.shape
    S = k.shape[2]
    rows = group * bq
    nq = T // bq
    nk = S // bk
    n_visit = _span_visits(window, bq, bk, nk)
    local = window is not None

    def kv_index(b, g, i, j):
        if local:
            return (b, g, jnp.clip((i * bq - window // 2) // bk + j, 0, nk - 1), 0)
        return (b, g, j, 0)

    kernel = functools.partial(
        _fwd_kernel, bq=bq, bk=bk, nk=nk, group=group, window=window, fast=fast
    )

    o, lse = pl.pallas_call(
        kernel,
        grid=(B, H // group, nq, n_visit),
        in_specs=[
            pl.BlockSpec((1, group, bq, D), lambda b, g, i, j: (b, g, i, 0)),
            pl.BlockSpec((1, 1, bk, D), kv_index),
            pl.BlockSpec((1, 1, bk, D), kv_index),
        ],
        out_specs=[
            pl.BlockSpec((1, group, bq, D), lambda b, g, i, j: (b, g, i, 0)),
            pl.BlockSpec((1, 1, rows, 1), lambda b, g, i, j: (b, g, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, T, D), qh.dtype),
            jax.ShapeDtypeStruct((B, H // group, nq * rows, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows, D), jnp.float32),
            pltpu.VMEM((rows, 1), jnp.float32),
            pltpu.VMEM((rows, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary")
        ),
    )(qh, k, v)
    return o, lse


# ---------------------------------------------------------------- backward


def _dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, dq_acc, *, bq, bk, nk, group, window
):
    i = pl.program_id(2)
    j = pl.program_id(3)
    n_visit = pl.num_programs(3)

    @pl.when(j == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    virtual = (i * bq - window // 2) // bk + j if window is not None else j
    valid = jnp.logical_and(virtual >= 0, virtual < nk) if window is not None else (j >= 0)

    @pl.when(valid)
    def _update():
        rows = group * bq
        D = q_ref.shape[-1]
        q = q_ref[0].reshape(rows, D)
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0].reshape(rows, D)
        lse = lse_ref[0, 0]  # (rows, 1), natural log
        delta = delta_ref[0, 0]

        # q carries scale*log2e; recover base-e logits via *ln2
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32) * LN2
        s = _masked(s, i * bq, virtual * bk, window, bq)
        p = jnp.exp(s - lse)

        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        ds = p * (dp - delta)  # d(loss)/d(s_base_e); q prescale folds the scale

        dq_acc[:] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(j == n_visit - 1)
    def _finalize():
        # emitted in the PRE-SCALED q's frame; the caller multiplies the
        # constant back out (dq/dq_scaled = scale*log2e)
        dq_ref[0] = dq_acc[:].astype(dq_ref.dtype).reshape(dq_ref.shape[1:])


def _dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref, dk_acc, dv_acc,
    *, bq, bk, nq, group, window,
):
    jk = pl.program_id(2)  # kv block
    ii = pl.program_id(3)  # visited folded q block
    n_visit = pl.num_programs(3)

    @pl.when(ii == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    virtual = (jk * bk - window // 2) // bq + ii if window is not None else ii
    valid = jnp.logical_and(virtual >= 0, virtual < nq) if window is not None else (ii >= 0)

    @pl.when(valid)
    def _update():
        rows = group * bq
        D = q_ref.shape[-1]
        q = q_ref[0].reshape(rows, D)
        k = k_ref[0, 0]  # (bk, D)
        v = v_ref[0, 0]
        do = do_ref[0].reshape(rows, D)
        lse = lse_ref[0, 0]
        delta = delta_ref[0, 0]

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32) * LN2
        s = _masked(s, virtual * bq, jk * bk, window, bq)
        p = jnp.exp(s - lse)

        # dv/dk accumulate over BOTH the q rows and the folded head group
        dv_acc[:] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        # k's gradient sees the prescaled q; the ln2 of d(s)/d(q.k) is folded
        # with the caller-side constant (see _flash_bwd)
        dk_acc[:] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(ii == n_visit - 1)
    def _finalize():
        dk_ref[0, 0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_bwd(group, bq, bk, window, res, g):
    qh, k, v, oh, lse = res
    lse = lse[..., None]  # residual stored squeezed; kernels want (B, Kv, QR, 1)
    doh, _ = g
    B, H, T, D = qh.shape
    S = k.shape[2]
    rows = group * bq
    nq = T // bq
    nk = S // bk
    n_visit_k = _span_visits(window, bq, bk, nk)
    n_visit_q = _span_visits(window, bk, bq, nq)
    local = window is not None

    # per-row delta, folded to the kernels' row order (small: (B,H,T,1) f32)
    delta = _fold_rows(
        jnp.sum(doh.astype(jnp.float32) * oh.astype(jnp.float32), axis=-1, keepdims=True), group, bq
    )

    def kv_index(b, g_, i, j):
        if local:
            return (b, g_, jnp.clip((i * bq - window // 2) // bk + j, 0, nk - 1), 0)
        return (b, g_, j, 0)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, bq=bq, bk=bk, nk=nk, group=group, window=window),
        grid=(B, H // group, nq, n_visit_k),
        in_specs=[
            pl.BlockSpec((1, group, bq, D), lambda b, g_, i, j: (b, g_, i, 0)),
            pl.BlockSpec((1, 1, bk, D), kv_index),
            pl.BlockSpec((1, 1, bk, D), kv_index),
            pl.BlockSpec((1, group, bq, D), lambda b, g_, i, j: (b, g_, i, 0)),
            pl.BlockSpec((1, 1, rows, 1), lambda b, g_, i, j: (b, g_, i, 0)),
            pl.BlockSpec((1, 1, rows, 1), lambda b, g_, i, j: (b, g_, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, group, bq, D), lambda b, g_, i, j: (b, g_, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, T, D), qh.dtype),
        scratch_shapes=[pltpu.VMEM((rows, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary")
        ),
    )(qh, k, v, doh, lse, delta)

    def q_index(b, g_, jk, ii):
        if local:
            return (b, g_, jnp.clip((jk * bk - window // 2) // bq + ii, 0, nq - 1), 0)
        return (b, g_, ii, 0)

    q_index_rows = q_index  # lse/delta share the q blocks' folded indexing

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, bq=bq, bk=bk, nq=nq, group=group, window=window),
        grid=(B, H // group, nk, n_visit_q),
        in_specs=[
            pl.BlockSpec((1, group, bq, D), q_index),
            pl.BlockSpec((1, 1, bk, D), lambda b, g_, jk, ii: (b, g_, jk, 0)),
            pl.BlockSpec((1, 1, bk, D), lambda b, g_, jk, ii: (b, g_, jk, 0)),
            pl.BlockSpec((1, group, bq, D), q_index),
            pl.BlockSpec((1, 1, rows, 1), q_index_rows),
            pl.BlockSpec((1, 1, rows, 1), q_index_rows),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bk, D), lambda b, g_, jk, ii: (b, g_, jk, 0)),
            pl.BlockSpec((1, 1, bk, D), lambda b, g_, jk, ii: (b, g_, jk, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H // group, S, D), k.dtype),
            jax.ShapeDtypeStruct((B, H // group, S, D), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, D), jnp.float32),
            pltpu.VMEM((bk, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary")
        ),
    )(qh, k, v, doh, lse, delta)

    # chain-rule constants: s_e = ln2 * (q_scaled . k); ds/dq_scaled = ln2*k
    # was emitted without the ln2 (folded here); dk = ln2 * q_scaled^T ds
    return dq * LN2, dk * LN2, dv


# -------------------------------------------------------------- public API


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _flash_attention_headmajor(qh, k, v, group, bq, bk, window, fast=False):
    o, _ = _flash_fwd(qh, k, v, group, bq, bk, window, fast)
    return o


def _fwd_rule(qh, k, v, group, bq, bk, window, fast=False):
    # the exact-softmax forward backs the residuals; fast mode is never
    # differentiated (samplers only), but keep bwd numerically consistent
    o, lse = _flash_fwd(qh, k, v, group, bq, bk, window, False)
    # squeeze the residual: XLA pads a trailing dim of 1 by 128x in HBM, so a
    # (B, Kv, QR, 1) tensor held for the whole backward would cost 128x its
    # logical size; the padded form stays a transient inside fwd/bwd instead
    return o, (qh, k, v, o, lse[..., 0])


def _bwd_rule(group, bq, bk, window, fast, res, g):
    return _flash_bwd(group, bq, bk, window, res, (g, None))


_flash_attention_headmajor.defvjp(_fwd_rule, _bwd_rule)


def flash_attention_available(t: int, s: int, d: int) -> bool:
    """Can the kernel tile this shape? (head dim lane-friendly, seq divisible)."""
    return d % 64 == 0 and _pick_block(t, 512) > 0 and _pick_block(s, DEFAULT_BLOCK_K) > 0


def flash_attention_headmajor(
    qh: jnp.ndarray,  # (B, H, T, D)
    kh: jnp.ndarray,  # (B, Kv, S, D)
    vh: jnp.ndarray,  # (B, Kv, S, D)
    window: Optional[int] = None,
) -> jnp.ndarray:
    """Head-major GQA flash attention, optionally windowed. Returns
    (B, H, T, D). This is the kernel's NATIVE layout — callers that already
    hold head-major activations (the UNet attention layer, whose RoPE pass
    produces them) avoid every XLA-side transpose: the softmax scale and
    exp2-domain factor below fuse into the upstream elementwise pass."""
    B, H, T, D = qh.shape
    S, Kv = kh.shape[2], kh.shape[1]
    assert H % Kv == 0
    group = H // Kv
    bq, bk = _choose_blocks(T, S, group)
    assert bq and bk, f"untileable shape T={T} S={S}; guard with flash_attention_available"
    if window is not None and S <= window:
        window = None  # window covers the whole sequence: run the global path

    qh = qh * jnp.asarray(D**-0.5 * LOG2E, qh.dtype)
    return _flash_attention_headmajor(qh, kh, vh, group, bq, bk, window, _INFERENCE.get())


def flash_attention(
    q: jnp.ndarray,  # (B, T, H, D)
    k: jnp.ndarray,  # (B, S, Kv, D)
    v: jnp.ndarray,  # (B, S, Kv, D)
    window: Optional[int] = None,
) -> jnp.ndarray:
    """Sequence-major GQA flash attention, optionally windowed. (B, T, H, D)."""
    oh = flash_attention_headmajor(
        jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2), window
    )
    return jnp.swapaxes(oh, 1, 2)

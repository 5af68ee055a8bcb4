"""Flash attention for TPU in Pallas: the framework's centerpiece kernel.

Replaces the reference's CUDA flash-SDPA dependency (reference
osu_fusion/modules/attention.py:61-101) with a TPU-native tiled kernel:

- FlashAttention-2 style online softmax: the (T, S) logits matrix is never
  materialized — HBM traffic is O(T*D) instead of O(T^2);
- grouped-query support: KV heads are indexed via the BlockSpec index map, so
  MQA/GQA never repeats KV in memory;
- optional LOCAL (sliding-window) attention: each query attends keys within
  +/- window/2, and the kernel only VISITS the KV blocks intersecting the
  window — full-song (65k-frame) UNet levels drop from O(T^2) to O(T*W)
  FLOPs, which is what makes the <10 s full-song generation target reachable
  (SURVEY.md section 5.7: the reference trains on <=8k crops, so global
  attention at 65k is outside its training distribution anyway; the window is
  set to each level's trained context length);
- grid (B, H, nQ, nK) with VMEM accumulator scratch carried across the
  innermost (sequential) KV-block dimension; logits/softmax in fp32 on the
  MXU/VPU, p@v accumulated fp32;
- custom VJP with the standard recompute backward (dq kernel + dkv kernel),
  log-sum-exp saved from the forward.

Falls back to the XLA einsum path for shapes the kernel doesn't tile
(sequence not a multiple of the block size) and on non-TPU backends.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 512
NEG_INF = -1e30


def _pick_block(t: int, preferred: int) -> int:
    for b in (preferred, 512, 256, 128):
        if b <= preferred and t % b == 0:
            return b
    return 0


def _window_mask(s: jnp.ndarray, q_start, k_start, window: Optional[int]):
    """Apply the +/- window/2 token mask to a (BQ, BK) logits chunk."""
    if window is None:
        return s
    bq, bk = s.shape
    rows = q_start + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
    cols = k_start + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    return jnp.where(jnp.abs(rows - cols) <= window // 2, s, NEG_INF)


def _kv_span_blocks(window: Optional[int], block_q: int, block_k: int, nk: int) -> tuple[int, int]:
    """(wb, n_visit): KV-block backoff and number of visited blocks per q block.

    The visit span is always 2*wb+1 centered on the diagonal; out-of-range
    visits are masked off inside the kernel (clamping the span would shift the
    center for edge blocks).
    """
    if window is None:
        return nk, nk
    # blocks intersecting [q_start - w/2, q_end + w/2): safe overestimate
    wb = (window // 2 + block_q - 1) // block_k + 1
    return wb, 2 * wb + 1


# ----------------------------------------------------------------- forward


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, acc_ref, m_ref, l_ref, *, scale, block_q, block_k, nk, wb, window):
    i = pl.program_id(2)
    j = pl.program_id(3)
    n_visit = pl.num_programs(3)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    virtual = i - wb + j if window is not None else j
    valid = jnp.logical_and(virtual >= 0, virtual < nk) if window is not None else (j >= 0)

    @pl.when(valid)
    def _update():
        q = q_ref[0, 0]  # (BQ, D)
        k = k_ref[0, 0]  # (BK, D)
        v = v_ref[0, 0]

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        s = s * scale
        s = _window_mask(s, i * block_q, virtual * block_k, window)

        m_prev = m_ref[:, :1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)

        p = jnp.exp(s - m_new)
        correction = jnp.exp(m_prev - m_new)
        l_new = correction * l_ref[:, :1] + jnp.sum(p, axis=1, keepdims=True)

        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        acc_ref[:] = acc_ref[:] * correction + pv
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(j == n_visit - 1)
    def _finalize():
        l = l_ref[:, :1]
        o_ref[0, 0] = (acc_ref[:] / l).astype(o_ref.dtype)
        lse_ref[0, 0] = m_ref[:, :1] + jnp.log(l)


def _flash_fwd(q, k, v, scale, block_q, block_k, window):
    B, H, T, D = q.shape
    _, Kv, S, _ = k.shape
    group = H // Kv
    nq = T // block_q
    nk = S // block_k
    wb, n_visit = _kv_span_blocks(window, block_q, block_k, nk)
    local = window is not None

    def kv_index(b, h, i, j):
        if local:
            return (b, h // group, jnp.clip(i - wb + j, 0, nk - 1), 0)
        return (b, h // group, j, 0)

    kernel = functools.partial(
        _fwd_kernel, scale=scale, block_q=block_q, block_k=block_k, nk=nk, wb=wb,
        window=window,
    )

    o, lse = pl.pallas_call(
        kernel,
        grid=(B, H, nq, n_visit),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_k, D), kv_index),
            pl.BlockSpec((1, 1, block_k, D), kv_index),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda b, h, i, j: (b, h, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, T, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, T, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, D), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
    )(q, k, v)
    return o, lse


# ---------------------------------------------------------------- backward


def _dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, dq_acc, *, scale, block_q, block_k, nk, wb, window
):
    i = pl.program_id(2)
    j = pl.program_id(3)
    n_visit = pl.num_programs(3)

    @pl.when(j == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    virtual = i - wb + j if window is not None else j
    valid = jnp.logical_and(virtual >= 0, virtual < nk) if window is not None else (j >= 0)

    @pl.when(valid)
    def _update():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0]  # (BQ, 1)
        delta = delta_ref[0, 0]  # (BQ, 1)

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32) * scale
        s = _window_mask(s, i * block_q, virtual * block_k, window)
        p = jnp.exp(s - lse)

        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        ds = p * (dp - delta) * scale

        dq_acc[:] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(j == n_visit - 1)
    def _finalize():
        dq_ref[0, 0] = dq_acc[:].astype(dq_ref.dtype)


def _dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref, dk_acc, dv_acc,
    *, scale, block_q, block_k, nq, wb, window,
):
    jk = pl.program_id(2)  # kv block
    ii = pl.program_id(3)  # visited q block
    n_visit = pl.num_programs(3)

    @pl.when(ii == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    virtual = jk - wb + ii if window is not None else ii
    valid = jnp.logical_and(virtual >= 0, virtual < nq) if window is not None else (ii >= 0)

    @pl.when(valid)
    def _update():
        q = q_ref[0, 0]  # (BQ, D)
        k = k_ref[0, 0]  # (BK, D)
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0]
        delta = delta_ref[0, 0]

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32) * scale
        s = _window_mask(s, virtual * block_q, jk * block_k, window)
        p = jnp.exp(s - lse)

        dv_acc[:] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        ds = p * (dp - delta) * scale

        dk_acc[:] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(ii == n_visit - 1)
    def _finalize():
        dk_ref[0, 0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_bwd(scale, block_q, block_k, window, res, g):
    q, k, v, o, lse = res
    do, _ = g
    B, H, T, D = q.shape
    _, Kv, S, _ = k.shape
    group = H // Kv
    nq = T // block_q
    nk = S // block_k
    wb, n_visit_k = _kv_span_blocks(window, block_q, block_k, nk)
    _, n_visit_q = _kv_span_blocks(window, block_k, block_q, nq)
    local = window is not None

    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True)  # (B, H, T, 1)

    def kv_index(b, h, i, j):
        if local:
            return (b, h // group, jnp.clip(i - wb + j, 0, nk - 1), 0)
        return (b, h // group, j, 0)

    dq = pl.pallas_call(
        functools.partial(
            _dq_kernel, scale=scale, block_q=block_q, block_k=block_k, nk=nk, wb=wb, window=window
        ),
        grid=(B, H, nq, n_visit_k),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_k, D), kv_index),
            pl.BlockSpec((1, 1, block_k, D), kv_index),
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda b, h, i, j: (b, h, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j: (b, h, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, T, D), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, D), jnp.float32)],
    )(q, k, v, do, lse, delta)

    def q_index(b, h, jk, ii):
        if local:
            return (b, h, jnp.clip(jk - wb + ii, 0, nq - 1), 0)
        return (b, h, ii, 0)

    # per-query-head dk/dv, then sum over the heads sharing each KV head
    dk_h, dv_h = pl.pallas_call(
        functools.partial(
            _dkv_kernel, scale=scale, block_q=block_q, block_k=block_k, nq=nq, wb=wb, window=window
        ),
        grid=(B, H, nk, n_visit_q),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, D), q_index),
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, jk, ii: (b, h // group, jk, 0)),
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, jk, ii: (b, h // group, jk, 0)),
            pl.BlockSpec((1, 1, block_q, D), q_index),
            pl.BlockSpec((1, 1, block_q, 1), q_index),
            pl.BlockSpec((1, 1, block_q, 1), q_index),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, jk, ii: (b, h, jk, 0)),
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, jk, ii: (b, h, jk, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, S, D), k.dtype),
            jax.ShapeDtypeStruct((B, H, S, D), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, D), jnp.float32),
            pltpu.VMEM((block_k, D), jnp.float32),
        ],
    )(q, k, v, do, lse, delta)

    dk = dk_h.reshape(B, Kv, group, S, D).sum(axis=2).astype(k.dtype)
    dv = dv_h.reshape(B, Kv, group, S, D).sum(axis=2).astype(v.dtype)
    return dq, dk, dv


# -------------------------------------------------------------- public API


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_attention_hmajor(q, k, v, scale, block_q, block_k, window):
    o, _ = _flash_fwd(q, k, v, scale, block_q, block_k, window)
    return o


def _fwd_rule(q, k, v, scale, block_q, block_k, window):
    o, lse = _flash_fwd(q, k, v, scale, block_q, block_k, window)
    return o, (q, k, v, o, lse)


def _bwd_rule(scale, block_q, block_k, window, res, g):
    return _flash_bwd(scale, block_q, block_k, window, res, (g, None))


_flash_attention_hmajor.defvjp(_fwd_rule, _bwd_rule)


def flash_attention_available(t: int, s: int, d: int) -> bool:
    """Can the kernel tile this shape? (head dim lane-friendly, seq divisible)."""
    return d % 64 == 0 and _pick_block(t, DEFAULT_BLOCK_Q) > 0 and _pick_block(s, DEFAULT_BLOCK_K) > 0


def flash_attention(
    q: jnp.ndarray,  # (B, T, H, D)
    k: jnp.ndarray,  # (B, S, Kv, D)
    v: jnp.ndarray,  # (B, S, Kv, D)
    window: Optional[int] = None,
) -> jnp.ndarray:
    """Sequence-major GQA flash attention, optionally windowed. (B, T, H, D)."""
    B, T, H, D = q.shape
    S, Kv = k.shape[1], k.shape[2]
    block_q = _pick_block(T, DEFAULT_BLOCK_Q)
    block_k = _pick_block(S, DEFAULT_BLOCK_K)
    assert block_q and block_k, f"untileable shape T={T} S={S}; guard with flash_attention_available"
    if window is not None:
        # equal blocks keep the local index arithmetic exact
        block_q = block_k = min(block_q, block_k)
        if window // 2 >= S - 1:
            window = None  # window covers everything: run the global path

    scale = D**-0.5
    qh = jnp.swapaxes(q, 1, 2)  # (B, H, T, D)
    kh = jnp.swapaxes(k, 1, 2)
    vh = jnp.swapaxes(v, 1, 2)
    o = _flash_attention_hmajor(qh, kh, vh, scale, block_q, block_k, window)
    return jnp.swapaxes(o, 1, 2)

"""Blockwise-int8 AdamW moment storage — a TPU-native 8-bit Adam.

The production 1.28B-param model's two Adam moments cost 2x the param
bytes (5.1 GB in bf16) — at the T=65536 full-song regime that is a third
of a v5e's 15.75 GB and is exactly the HBM that decides which remat
policy fits (bench_results/r05_fullsong_*.json: uniform save-attn-out
missed by 501 MB, save-attn at the widest level by 814 MB). Storing both
moments as blockwise absmax-quantized int8 frees ~2.5 GB of that budget
for activation residuals, which buys back attention recompute in the
backward — memory traded where it is cheapest.

Quantization scheme (the 8-bit-Adam recipe of Dettmers et al. 2021,
rebuilt as pure XLA ops — jit/pjit-safe, static shapes, donation-friendly;
the reference trains with torch.optim.AdamW and has no counterpart):

- first moment ``mu``: linear absmax int8 per 256-element block of the
  flattened tensor (max relative error ~0.4% of the block max);
- second moment ``nu``: stored as ``sqrt(nu)`` quantized the same way —
  the sqrt domain halves the dynamic range in log terms, which linear
  absmax handles where raw ``nu`` (spanning ~squares) would not;
- the update math runs in float32 each step: dequantize, Adam update,
  bias-corrected step, requantize.

State layout is chosen for ``train.loop.shard_state``'s placement rules:
the quantized moments keep the PARAM'S SHAPE (int8), so the existing
ZeRO-1 / tensor-parallel sharding logic (which keys on tree structure and
leaf shapes) applies to them unchanged; the per-block scale vectors ride
in parallel trees with 1-tuple-wrapped leaves, which breaks the
tree-structure match and lets them fall through to replicated placement
(they are small: size/256 float32s ≈ 20 MB per moment at 1.28B params).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

BLOCK = 256


def _n_blocks(n: int) -> int:
    return -(-max(n, 1) // BLOCK)


def quantize_blockwise(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """float tensor -> (int8 tensor of the same shape, (n_blocks,) f32 scales).

    Linear absmax per BLOCK-element block of the flattened tensor; all-zero
    blocks quantize to zeros with a zero scale (safe divide).
    """
    flat = x.reshape(-1).astype(jnp.float32)
    n = flat.shape[0]
    nb = _n_blocks(n)
    fb = jnp.pad(flat, (0, nb * BLOCK - n)).reshape(nb, BLOCK)
    scale = jnp.max(jnp.abs(fb), axis=1) / 127.0
    q = jnp.round(fb / jnp.maximum(scale, 1e-30)[:, None])
    q = jnp.clip(q, -127, 127).astype(jnp.int8)
    return q.reshape(-1)[:n].reshape(x.shape), scale


def dequantize_blockwise(q: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`quantize_blockwise` (up to the rounding error)."""
    n = q.size
    nb = scale.shape[0]
    fb = jnp.pad(q.reshape(-1).astype(jnp.float32), (0, nb * BLOCK - n)).reshape(nb, BLOCK)
    return (fb * scale[:, None]).reshape(-1)[:n].reshape(q.shape)


class AdamInt8State(NamedTuple):
    count: jnp.ndarray
    mu_q: Any  # params-shaped int8 trees (inherit param/ZeRO-1 shardings)
    mu_s: Any  # params-structured trees of 1-tuples of (n_blocks,) f32 scales
    nu_q: Any  # stores sqrt(nu), quantized
    nu_s: Any


def scale_by_adam_int8(
    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8
) -> optax.GradientTransformation:
    """Drop-in for ``optax.scale_by_adam`` with int8-quantized moments."""

    def init_fn(params):
        mu_q = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.int8), params)
        mu_s = jax.tree.map(lambda p: (jnp.zeros((_n_blocks(p.size),), jnp.float32),), params)
        return AdamInt8State(
            count=jnp.zeros((), jnp.int32),
            mu_q=mu_q,
            mu_s=mu_s,
            nu_q=jax.tree.map(lambda q: q, mu_q),
            nu_s=jax.tree.map(lambda s: s, mu_s),
        )

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        c1 = 1.0 - b1 ** count.astype(jnp.float32)
        c2 = 1.0 - b2 ** count.astype(jnp.float32)

        leaves_g, treedef = jax.tree_util.tree_flatten(updates)
        leaves_mq = treedef.flatten_up_to(state.mu_q)
        leaves_ms = treedef.flatten_up_to(state.mu_s)
        leaves_nq = treedef.flatten_up_to(state.nu_q)
        leaves_ns = treedef.flatten_up_to(state.nu_s)

        out_u, out_mq, out_ms, out_nq, out_ns = [], [], [], [], []
        for g, mq, ms, nq, ns in zip(leaves_g, leaves_mq, leaves_ms, leaves_nq, leaves_ns):
            gf = g.astype(jnp.float32)
            mu = dequantize_blockwise(mq, ms[0])
            root = dequantize_blockwise(nq, ns[0])
            nu = root * root
            mu = b1 * mu + (1.0 - b1) * gf
            nu = b2 * nu + (1.0 - b2) * gf * gf
            step = (mu / c1) / (jnp.sqrt(nu / c2) + eps)
            mq2, ms2 = quantize_blockwise(mu)
            nq2, ns2 = quantize_blockwise(jnp.sqrt(nu))
            out_u.append(step.astype(g.dtype))
            out_mq.append(mq2)
            out_ms.append((ms2,))
            out_nq.append(nq2)
            out_ns.append((ns2,))

        unflat = jax.tree_util.tree_unflatten
        return unflat(treedef, out_u), AdamInt8State(
            count=count,
            mu_q=unflat(treedef, out_mq),
            mu_s=unflat(treedef, out_ms),
            nu_q=unflat(treedef, out_nq),
            nu_s=unflat(treedef, out_ns),
        )

    return optax.GradientTransformation(init_fn, update_fn)


def adamw_int8(
    learning_rate: optax.ScalarOrSchedule,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 1e-4,
    mask: Optional[Any] = None,
) -> optax.GradientTransformation:
    """AdamW with int8 moment storage — same chain shape as ``optax.adamw``
    (scale_by_adam -> add_decayed_weights -> scale_by_learning_rate) and the
    same defaults, so swapping it in changes only the moment precision."""
    return optax.chain(
        scale_by_adam_int8(b1=b1, b2=b2, eps=eps),
        optax.add_decayed_weights(weight_decay, mask=mask),
        optax.scale_by_learning_rate(learning_rate),
    )

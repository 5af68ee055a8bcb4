"""Sequence parallelism: windowed attention over a sequence-sharded mesh axis.

The reference caps full-sequence training at 65536 frames on ONE GPU
(reference osu_fusion/library/dataset.py:134-143) because global SDPA is
O(T^2) in memory. Our long-context strategy is windowed attention beyond the
trained context (SURVEY.md section 5.7), and a +/- window/2 window makes
sequence parallelism CHEAP on a TPU mesh: a query shard only ever needs the
window/2 frames adjacent to its boundaries, so the only communication is a
HALO EXCHANGE with the two neighbouring devices — two `ppermute`s per
attention layer riding ICI, O(window) bytes instead of ring-attention's
O(T) rotation through every device.

The kernel side (`ops/pallas_attention.py` halo section) takes the local
query shard plus a halo-extended KV slab and masks by GLOBAL sequence
bounds, which arrive as scalar-prefetch operands — one compiled kernel
serves every device in the shard_map. The halo exchange itself is plain
differentiable JAX (`ppermute` + `concatenate`), so the backward pass routes
halo K/V gradients back to their home devices through the transposed
permutes automatically — no hand-written gradient shuffle.

Edge devices receive zeros from the (non-wrapping) permutes; the kernel's
bounds mask excludes those positions, reproducing the single-chip windowed
kernel's truncated-window edge semantics EXACTLY (pinned by
tests/test_sequence_parallel.py against `flash_attention` on the gathered
sequence).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _exchange_halo(x: jnp.ndarray, w2: int, axis_name: str, n_shards: int) -> jnp.ndarray:
    """(B, T_local, ...) -> (B, T_local + 2*w2, ...): prepend the left
    neighbour's tail and append the right neighbour's head. Non-wrapping:
    the first/last device get zeros, masked off by the kernel's bounds."""
    if n_shards == 1:
        pad = [(0, 0)] * x.ndim
        pad[1] = (w2, w2)
        return jnp.pad(x, pad)
    fwd = [(d, d + 1) for d in range(n_shards - 1)]  # data flows left -> right
    bwd = [(d + 1, d) for d in range(n_shards - 1)]
    from_left = jax.lax.ppermute(x[:, -w2:], axis_name, fwd)
    from_right = jax.lax.ppermute(x[:, :w2], axis_name, bwd)
    return jnp.concatenate([from_left, x, from_right], axis=1)


def _seq_attention_local(q, k, v, *, window: int, axis_name: str, n_shards: int, t_global: int):
    """Per-device body: q (B, T_local, H, D), k/v (B, T_local, D)."""
    from osufusion_tpu.ops.pallas_attention import halo_flash_attention

    w2 = window // 2
    t_local = q.shape[1]
    assert t_local >= w2, (
        f"halo exchange needs T_local >= window/2 ({t_local} < {w2}): "
        "use fewer seq shards or a smaller window"
    )
    g0 = jax.lax.axis_index(axis_name) * t_local
    k_ext = _exchange_halo(k, w2, axis_name, n_shards)
    v_ext = _exchange_halo(v, w2, axis_name, n_shards)
    return halo_flash_attention(q, k_ext, v_ext, window, g0, t_global)


def seq_axis_size(mesh: Mesh | None = None, axis: str = "seq") -> int:
    """Size of the sequence axis on ``mesh`` or the ambient (set_mesh /
    use_mesh) mesh; 0 when no mesh with that axis is active."""
    if mesh is not None:
        return mesh.shape.get(axis, 0)
    try:
        am = jax.sharding.get_abstract_mesh()
    except Exception:
        return 0
    if am is None or axis not in getattr(am, "axis_names", ()):
        return 0
    return dict(zip(am.axis_names, am.axis_sizes))[axis]


def seq_parallel_available(t: int, s: int, d: int, window: int | None, n: int) -> bool:
    """Can the halo path serve this site? Self-attention with an engaged
    window, shards that tile the flash kernel, and halos no wider than a
    shard (halo exchange only reaches the immediate neighbours)."""
    from osufusion_tpu.ops.pallas_attention import _pick_block

    if n <= 1 or window is None or t != s or window >= t or t % n != 0:
        return False
    t_local = t // n
    return (
        d % 64 == 0
        and t_local >= window // 2
        and _pick_block(t_local, 512) > 0
        and _pick_block(t_local + window, 512) > 0
    )


def sequence_parallel_attention(
    q: jnp.ndarray,  # (B, T, H, D) global, sharded on T over `axis`
    k: jnp.ndarray,  # (B, T, Kv, D)
    v: jnp.ndarray,  # (B, T, Kv, D)
    window: int,
    mesh: Mesh | None = None,
    axis: str = "seq",
    batch_axis: str | None = None,
) -> jnp.ndarray:
    """Windowed flash attention over a sequence-sharded mesh axis.

    With ``mesh=None`` the ambient mesh (``jax.sharding.set_mesh`` /
    ``use_mesh`` around the jitted caller) is used — this is how the
    in-model dispatch (ops/attention.py) reaches it without threading a
    Mesh through every module. ``batch_axis`` (e.g. "data") declares the
    batch dim's sharding so data parallelism composes without an
    all-gather; head/feature dims are declared replicated — combining
    seq parallelism with tensor-parallel attention heads would reshard
    q/k/v over 'model' at the shard_map boundary (correct, not free).

    GQA (Kv > 1) runs one halo call per KV head on its query-head slice,
    mirroring `flash_attention`'s dispatch. The window must be strictly
    smaller than the sequence (otherwise windowing is off and attention is
    global — use tensor/data parallelism for that regime)."""
    T = q.shape[1]
    assert window < T, "window covers the whole sequence: use flash_attention"

    def make_body(n: int):
        return functools.partial(
            _seq_attention_local,
            window=window, axis_name=axis, n_shards=n, t_global=T,
        )

    return seq_sharded_attention(make_body, q, k, v, mesh, axis, batch_axis)


def seq_sharded_attention(
    make_body,
    q: jnp.ndarray,  # (B, T, H, D)
    k: jnp.ndarray,  # (B, T, Kv, D)
    v: jnp.ndarray,  # (B, T, Kv, D)
    mesh: Mesh | None = None,
    axis: str = "seq",
    batch_axis: str | None = None,
) -> jnp.ndarray:
    """Shared wrapper for the sequence-sharded attention paths (halo AND
    ring): per-KV-head GQA recursion, the missing-batch-axis fallback, the
    shard_map spec construction, and the rank-3 KV reshape. ``make_body(n)``
    returns the per-device body ``(q, k3, v3) -> o`` for n sequence shards."""
    B, T, H, D = q.shape
    Kv = k.shape[2]
    n = seq_axis_size(mesh, axis)
    assert n >= 1, f"no '{axis}' axis on the active mesh"
    if batch_axis is not None and seq_axis_size(mesh, batch_axis) == 0:
        batch_axis = None  # mesh has no such axis (e.g. a seq-only test mesh)
    assert T % n == 0, f"sequence {T} not divisible by {n} '{axis}' shards"
    if Kv != 1:
        group = H // Kv
        outs = [
            seq_sharded_attention(
                make_body,
                q[:, :, g * group : (g + 1) * group, :],
                k[:, :, g : g + 1, :],
                v[:, :, g : g + 1, :],
                mesh, axis, batch_axis,
            )
            for g in range(Kv)
        ]
        return jnp.concatenate(outs, axis=2)

    seq = P(batch_axis, axis, None, None)
    kv_spec = P(batch_axis, axis, None)
    fn = jax.shard_map(
        make_body(n),
        mesh=mesh,
        in_specs=(seq, kv_spec, kv_spec),
        out_specs=seq,
        check_vma=False,
    )
    return fn(q, k.reshape(B, T, D), v.reshape(B, T, D))

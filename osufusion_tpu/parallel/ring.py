"""Ring attention: GLOBAL attention over a sequence-sharded mesh axis.

Companion to the halo path (parallel/sequence.py), covering the regime halos
cannot: attention sites whose window is OFF or wider than the sequence, where
every query needs every key. That includes every DiT/MMDiT layer (the
reference's transformer backbones attend globally, reference
osu_fusion/modules/dit.py) and the UNet's deeper levels once downsampling
brings a level's length under the trained context. Without this path, those
sites on a seq-sharded mesh fall back to GSPMD all-gathering the frame axis —
per-device memory goes O(T) and the seq axis buys nothing at those layers.

Mechanics (kernel side in ops/pallas_attention.py, ring section): the KV
chunks rotate around the `seq` axis with wrap-around ``ppermute``s — one hop
per step, n hops total — while each device's pinned query shard accumulates
per-chunk flash outputs through the exact online-softmax merge on base-2
LSEs. Per-device memory stays O(T_local * D); ICI carries the O(T) rotation,
which XLA's latency-hiding scheduler overlaps with the per-chunk kernels
(the next hop's ppermute only depends on the chunk, not on the merge). The
backward rotates (k, v, dk_acc, dv_acc) a second time; the travelling
accumulators arrive home after n hops holding every device's contribution,
so no transposed-gradient shuffles are hand-written.

Semantics are pinned against the single-chip global kernel by
tests/test_ring_attention.py (forward AND grads, interpret mode).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
from jax.sharding import Mesh

from osufusion_tpu.parallel.sequence import seq_sharded_attention


def ring_available(
    t: int, s: int, d: int, window: int | None, n: int, h: int = 1, kv: int = 1
) -> bool:
    """Can the ring path serve this site? Self-attention in the GLOBAL regime
    (window off or covering the whole sequence — the engaged-window case is
    the halo path's job), shards that tile the flash kernel. Full-MHA sites
    (h == kv — the DiT backbones, and the default h = kv = 1 which is the
    per-head slice a caller omitting h/kv asserts) run single-head kernel
    slices served by timestep folding, so the local shard must tile a fold
    too; grouped-GQA sites (h > kv) must pass their real h/kv or the fold
    check would wrongly gate them."""
    from osufusion_tpu.ops.pallas_attention import _choose_tfold, _pick_block

    if n <= 1 or t != s or t % n != 0 or d % 64 != 0:
        return False
    if window is not None and window < t:
        return False
    if h == kv and _choose_tfold(t // n, s // n)[2] == 0:
        return False
    return _pick_block(t // n, 512) > 0


def _ring_local(q, k, v, *, axis_name: str, n_shards: int):
    from osufusion_tpu.ops.pallas_attention import ring_flash_attention_local

    return ring_flash_attention_local(q, k, v, axis_name, n_shards)


def ring_attention(
    q: jnp.ndarray,  # (B, T, H, D) global, sharded on T over `axis`
    k: jnp.ndarray,  # (B, T, Kv, D)
    v: jnp.ndarray,  # (B, T, Kv, D)
    mesh: Mesh | None = None,
    axis: str = "seq",
    batch_axis: str | None = None,
) -> jnp.ndarray:
    """Exact global flash attention over a sequence-sharded mesh axis.

    Mirrors ``sequence_parallel_attention``'s calling convention: with
    ``mesh=None`` the ambient (set_mesh / use_mesh) mesh is used, which is
    how the in-model dispatch (ops/attention.py) reaches it without
    threading a Mesh through every module; ``batch_axis`` declares the batch
    dim's sharding so data parallelism composes without an all-gather. GQA
    (Kv > 1) runs one ring per KV head on its contiguous query-head slice,
    like ``flash_attention``'s dispatch. The GQA recursion, spec
    construction, and mesh fallbacks live in ``seq_sharded_attention``."""

    def make_body(n: int):
        return functools.partial(_ring_local, axis_name=axis, n_shards=n)

    return seq_sharded_attention(make_body, q, k, v, mesh, axis, batch_axis)

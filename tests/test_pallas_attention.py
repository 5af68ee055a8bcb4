"""Flash-attention kernel correctness vs the naive einsum reference, in
Pallas interpret mode (CPU). Real-chip numerics are exercised by bench.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from osufusion_tpu.ops.attention import gqa_attention
from osufusion_tpu.ops import pallas_attention as pa


def make_qkv(B=1, T=256, H=4, Kv=1, D=64, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(0, 1, (B, T, H, D)), dtype=dtype)
    k = jnp.asarray(rng.normal(0, 1, (B, T, Kv, D)), dtype=dtype)
    v = jnp.asarray(rng.normal(0, 1, (B, T, Kv, D)), dtype=dtype)
    return q, k, v


@pytest.mark.parametrize("kv_heads", [1, 2])
def test_flash_forward_matches_naive(kv_heads):
    q, k, v = make_qkv(B=2, T=256, H=4, Kv=kv_heads)
    with pltpu.force_tpu_interpret_mode():
        out_flash = pa.flash_attention(q, k, v)
    out_naive = gqa_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out_flash), np.asarray(out_naive), atol=2e-5, rtol=2e-5)


def test_flash_forward_multiblock():
    """More than one KV block exercises the online-softmax accumulation."""
    q, k, v = make_qkv(B=1, T=512, H=2, Kv=1)
    with pltpu.force_tpu_interpret_mode():
        out_flash = pa.flash_attention(q, k, v)
    out_naive = gqa_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out_flash), np.asarray(out_naive), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("kv_heads", [1, 2])
def test_flash_backward_matches_naive(kv_heads):
    q, k, v = make_qkv(B=1, T=256, H=2, Kv=kv_heads)

    def loss_flash(q, k, v):
        return (pa.flash_attention(q, k, v) * 0.01).sum()

    def loss_naive(q, k, v):
        return (gqa_attention(q, k, v) * 0.01).sum()

    with pltpu.force_tpu_interpret_mode():
        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_naive = jax.grad(loss_naive, argnums=(0, 1, 2))(q, k, v)
    for gf, gn, name in zip(g_flash, g_naive, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gn), atol=5e-5, rtol=5e-4, err_msg=f"d{name} mismatch"
        )


def test_local_window_forward_matches_naive():
    """Sliding-window flash vs masked einsum reference."""
    q, k, v = make_qkv(B=1, T=1024, H=2, Kv=1)
    window = 256
    with pltpu.force_tpu_interpret_mode():
        out_flash = pa.flash_attention(q, k, v, window=window)
    out_naive = gqa_attention(q, k, v, window=window)
    np.testing.assert_allclose(np.asarray(out_flash), np.asarray(out_naive), atol=2e-5, rtol=2e-5)
    # and the window genuinely changes the result vs global
    out_global = gqa_attention(q, k, v)
    assert not np.allclose(np.asarray(out_naive), np.asarray(out_global), atol=1e-3)


def test_local_window_backward_matches_naive():
    q, k, v = make_qkv(B=1, T=512, H=2, Kv=1)
    window = 256

    def loss_flash(q, k, v):
        return (pa.flash_attention(q, k, v, window=window) * 0.01).sum()

    def loss_naive(q, k, v):
        return (gqa_attention(q, k, v, window=window) * 0.01).sum()

    with pltpu.force_tpu_interpret_mode():
        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_naive = jax.grad(loss_naive, argnums=(0, 1, 2))(q, k, v)
    for gf, gn, name in zip(g_flash, g_naive, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gn), atol=5e-5, rtol=5e-4, err_msg=f"d{name} mismatch"
        )


def test_window_covering_sequence_equals_global():
    q, k, v = make_qkv(B=1, T=256, H=2, Kv=1)
    with pltpu.force_tpu_interpret_mode():
        out_windowed = pa.flash_attention(q, k, v, window=4096)
    out_global = gqa_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out_windowed), np.asarray(out_global), atol=2e-5, rtol=2e-5)


def test_window_engages_only_beyond_context():
    """The training-parity rule (VERDICT round-1 weak #4): a window equal to
    the sequence length is a NO-OP — training crops at T == attn_context_len
    match the reference's global SDPA exactly — while T > window genuinely
    localizes attention."""
    # T == window: local output identical to global, in both backends
    q, k, v = make_qkv(B=1, T=512, H=2, Kv=1)
    with pltpu.force_tpu_interpret_mode():
        out_local = pa.flash_attention(q, k, v, window=512)
        out_global = pa.flash_attention(q, k, v)
    np.testing.assert_array_equal(np.asarray(out_local), np.asarray(out_global))
    np.testing.assert_array_equal(
        np.asarray(gqa_attention(q, k, v, window=512)), np.asarray(gqa_attention(q, k, v))
    )

    # T == 2*window: the window must change the result
    q, k, v = make_qkv(B=1, T=1024, H=2, Kv=1)
    with pltpu.force_tpu_interpret_mode():
        out_local = pa.flash_attention(q, k, v, window=512)
        out_global = pa.flash_attention(q, k, v)
    assert not np.allclose(np.asarray(out_local), np.asarray(out_global), atol=1e-3)


def test_attention_module_window_rule():
    """Model-level: Attention(local=True) == Attention(local=False) at
    T == context_len (training regime), and differs at T == 2*context_len
    (sampling regime)."""
    from osufusion_tpu.nn.blocks import Attention

    def run(T, local):
        attn = Attention(dim_head=16, heads=4, kv_heads=1, context_len=128, backend="xla", local=local)
        x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (1, T, 64)), jnp.float32)
        params = attn.init(jax.random.PRNGKey(0), x)
        return np.asarray(attn.apply(params, x))

    np.testing.assert_array_equal(run(128, True), run(128, False))
    assert not np.allclose(run(256, True), run(256, False), atol=1e-4)


def test_local_window_unequal_blocks_matches_naive():
    """16-head MQA folds to bq=128 while bk stays 512: the window centering
    must hold with unequal block sizes (regression: mis-centered windows
    zeroed whole rows at full-song lengths)."""
    q, k, v = make_qkv(B=1, T=512, H=16, Kv=1)
    window = 128
    assert pa._choose_blocks(512, 512, 16) == (128, 512, 16)
    with pltpu.force_tpu_interpret_mode():
        out_flash = pa.flash_attention(q, k, v, window=window)
    out_naive = gqa_attention(q, k, v, window=window)
    np.testing.assert_allclose(np.asarray(out_flash), np.asarray(out_naive), atol=2e-5, rtol=2e-5)


def test_local_window_unequal_blocks_backward():
    q, k, v = make_qkv(B=1, T=512, H=8, Kv=1)
    window = 128

    def loss_flash(q, k, v):
        return (pa.flash_attention(q, k, v, window=window) * 0.01).sum()

    def loss_naive(q, k, v):
        return (gqa_attention(q, k, v, window=window) * 0.01).sum()

    with pltpu.force_tpu_interpret_mode():
        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_naive = jax.grad(loss_naive, argnums=(0, 1, 2))(q, k, v)
    for gf, gn, name in zip(g_flash, g_naive, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gn), atol=5e-5, rtol=5e-4, err_msg=f"d{name} mismatch"
        )


def test_block_picker_and_availability():
    assert pa._pick_block(4096, 512) == 512
    assert pa._pick_block(8320, 512) == 128  # 65x128: full-song deepest level
    assert pa._pick_block(100, 512) == 0
    assert pa.flash_attention_available(4096, 4096, 64)
    assert not pa.flash_attention_available(100, 100, 64)
    assert not pa.flash_attention_available(4096, 4096, 48)


def test_small_window_unequal_blocks_matches_naive():
    """Small window with bq < bk (the UNet bottleneck geometry: window 512,
    folded bq=128, bk=512): right-reach bound must cover the next kv block."""
    q, k, v = make_qkv(B=1, T=1024, H=16, Kv=1)
    for window in (256, 512):
        with pltpu.force_tpu_interpret_mode():
            out_flash = pa.flash_attention(q, k, v, window=window)
        out_naive = gqa_attention(q, k, v, window=window)
        np.testing.assert_allclose(
            np.asarray(out_flash), np.asarray(out_naive), atol=2e-5, rtol=2e-5, err_msg=f"window={window}"
        )


def test_wide_kv_narrow_q_backward_matches_naive():
    """Wide (1024) KV blocks shrink block_q to 64 to keep the f32 logits
    chunk inside VMEM — pin that production geometry fwd+bwd."""
    q, k, v = make_qkv(B=1, T=1024, H=16, Kv=1)
    assert pa._choose_blocks(1024, 1024, 16) == (64, 1024, 16), (
        "config no longer exercises the wide-KV/narrow-Q path; update shapes"
    )

    def loss_flash(q, k, v):
        return (pa.flash_attention(q, k, v) * 0.01).sum()

    def loss_naive(q, k, v):
        return (gqa_attention(q, k, v) * 0.01).sum()

    with pltpu.force_tpu_interpret_mode():
        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_naive = jax.grad(loss_naive, argnums=(0, 1, 2))(q, k, v)
    for gf, gn, name in zip(g_flash, g_naive, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gn), atol=5e-5, rtol=5e-4, err_msg=f"d{name} mismatch"
        )


def test_inference_fast_path_close_to_exact():
    """The bf16-softmax inference path stays within bf16-level error."""
    from osufusion_tpu.ops.pallas_attention import inference_attention

    q, k, v = make_qkv(B=1, T=1024, H=16, Kv=1, dtype=jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
        exact = pa.flash_attention(q, k, v, window=512)
        with inference_attention():
            fast = pa.flash_attention(q, k, v, window=512)
    err = np.abs(np.asarray(fast, np.float32) - np.asarray(exact, np.float32)).max()
    assert err < 0.02, f"fast-path error too large: {err}"


def test_full_mha_timestep_fold_matches_naive():
    """Full-MHA sites (H == Kv, the DiT/MMDiT backbones) reach the kernel as
    per-head H=1 slices; a (1, bq, 1, D) block would leave the MXU row dim at
    1, so the kernel folds consecutive TIMESTEPS into the row dimension
    instead (_choose_tfold). Exact for global attention."""
    q, k, v = make_qkv(B=2, T=512, H=4, Kv=4)
    assert pa._choose_tfold(512, 512)[2] > 1, "shapes no longer exercise the fold"
    with pltpu.force_tpu_interpret_mode():
        out_flash = pa.flash_attention(q, k, v)
    out_naive = gqa_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out_flash), np.asarray(out_naive), atol=2e-5, rtol=2e-5)


def test_full_mha_timestep_fold_backward():
    q, k, v = make_qkv(B=1, T=512, H=4, Kv=4)

    def loss_flash(q, k, v):
        return (pa.flash_attention(q, k, v) * 0.01).sum()

    def loss_naive(q, k, v):
        return (gqa_attention(q, k, v) * 0.01).sum()

    with pltpu.force_tpu_interpret_mode():
        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_naive = jax.grad(loss_naive, argnums=(0, 1, 2))(q, k, v)
    for gf, gn, name in zip(g_flash, g_naive, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gn), atol=5e-5, rtol=5e-4, err_msg=f"d{name} mismatch"
        )


def test_full_mha_fused_rope_inference():
    """Timestep-folded inference path with in-kernel rotary embedding: the
    plain (T, D) tables must line up with folded rows without the per-head
    row expansion the head-fold path needs."""
    from osufusion_tpu.ops.pallas_attention import inference_attention
    from osufusion_tpu.ops.rope import apply_rope, rope_tables

    q, k, v = make_qkv(B=1, T=512, H=4, Kv=4, dtype=jnp.bfloat16)
    tables = rope_tables(512, 64, scale_base=512.0)

    with pltpu.force_tpu_interpret_mode():
        exact = pa.flash_attention(apply_rope(q, *tables), apply_rope(k, *tables), v)
        with inference_attention():
            fused = pa.flash_attention(q, k, v, rope=tables)
    err = np.abs(np.asarray(fused, np.float32) - np.asarray(exact, np.float32)).max()
    assert err < 0.03, f"fused-rope full-MHA error too large: {err}"


def test_full_mha_windowed_falls_back_correctly():
    """Window masking maps kernel rows to positions, which a timestep fold
    would scramble — windowed H=1 slices must take the XLA fallback and stay
    exact."""
    q, k, v = make_qkv(B=1, T=512, H=4, Kv=4)
    window = 128
    with pltpu.force_tpu_interpret_mode():
        out = pa.flash_attention(q, k, v, window=window)
    ref = gqa_attention(q, k, v, window=window)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_fused_rope_inference_matches_xla_rope():
    """The in-kernel rotary embedding of the forward-only path matches the
    XLA-side apply_rope + exact kernel within bf16-level error."""
    from osufusion_tpu.ops.pallas_attention import inference_attention
    from osufusion_tpu.ops.rope import apply_rope, rope_tables

    q, k, v = make_qkv(B=1, T=512, H=16, Kv=1, dtype=jnp.bfloat16)
    tables = rope_tables(512, 64, scale_base=512.0)

    with pltpu.force_tpu_interpret_mode():
        exact = pa.flash_attention(apply_rope(q, *tables), apply_rope(k, *tables), v, window=256)
        with inference_attention():
            fused = pa.flash_attention(q, k, v, window=256, rope=tables)
    err = np.abs(np.asarray(fused, np.float32) - np.asarray(exact, np.float32)).max()
    assert err < 0.03, f"fused-rope error too large: {err}"


def test_fused_rope_training_forward_matches_xla_rope():
    """Round-5: the TRAINING path also fuses the rotary embedding into the
    kernels for global sites (q/k arrive raw; scale rides the q tables).
    Forward must match XLA apply_rope + pre-scaled kernel exactly-ish (f32
    inputs: the only difference is multiply ordering)."""
    from osufusion_tpu.ops.rope import apply_rope, rope_tables

    q, k, v = make_qkv(B=1, T=512, H=4, Kv=1)
    tables = rope_tables(512, 64, scale_base=512.0)

    with pltpu.force_tpu_interpret_mode():
        fused = pa.flash_attention(q, k, v, rope=tables)  # no inference ctx: training path
        ref = pa.flash_attention(apply_rope(q, *tables), apply_rope(k, *tables), v)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=5e-5, rtol=5e-4)


def test_fused_rope_training_grads_match_xla_rope():
    """The fused backward rotates q/k in-register to reproduce the forward's
    logits and UN-rotates dq (per-partial) and dk (at finalize): gradients
    must match the XLA-rope reference for all of q, k, v."""
    from osufusion_tpu.ops.rope import apply_rope, rope_tables

    q, k, v = make_qkv(B=1, T=512, H=4, Kv=1, seed=3)
    tables = rope_tables(512, 64, scale_base=512.0)

    def loss_fused(q, k, v):
        return (pa.flash_attention(q, k, v, rope=tables).astype(jnp.float32) ** 2).sum()

    def loss_ref(q, k, v):
        return (
            pa.flash_attention(apply_rope(q, *tables), apply_rope(k, *tables), v).astype(jnp.float32) ** 2
        ).sum()

    with pltpu.force_tpu_interpret_mode():
        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_fused, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), atol=1e-4, rtol=1e-3, err_msg=f"d{name} mismatch"
        )


def test_fused_rope_training_full_mha_fold_grads():
    """Timestep-folded (H == Kv) sites take the fused-RoPE training path too:
    plain (T, D) tables line up with folded rows; grads must survive the
    fold + unfold round trip."""
    from osufusion_tpu.ops.rope import apply_rope, rope_tables

    q, k, v = make_qkv(B=1, T=512, H=4, Kv=4, seed=5)
    tables = rope_tables(512, 64, scale_base=512.0)

    def loss_fused(q, k, v):
        return (pa.flash_attention(q, k, v, rope=tables).astype(jnp.float32) ** 2).sum()

    def loss_ref(q, k, v):
        return (
            pa.flash_attention(apply_rope(q, *tables), apply_rope(k, *tables), v).astype(jnp.float32) ** 2
        ).sum()

    with pltpu.force_tpu_interpret_mode():
        o_fused = pa.flash_attention(q, k, v, rope=tables)
        o_ref = pa.flash_attention(apply_rope(q, *tables), apply_rope(k, *tables), v)
        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(o_fused), np.asarray(o_ref), atol=5e-5, rtol=5e-4)
    for gf, gr, name in zip(g_fused, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), atol=1e-4, rtol=1e-3, err_msg=f"d{name} mismatch"
        )


def test_fused_rope_training_windowed_grads():
    """Round-5: WINDOWED training sites fuse the rotary embedding too — the
    split dq kernel rotates q into scratch and un-rotates dq in-register;
    the split dkv kernel rotates each visited q block in-register and dk is
    un-rotated by a tiny XLA pass (rank-3 MQA k). Outputs and grads must
    match the XLA-rope masked reference."""
    from osufusion_tpu.ops.rope import apply_rope, rope_tables

    q, k, v = make_qkv(B=1, T=512, H=4, Kv=1, seed=7)
    tables = rope_tables(512, 64, scale_base=512.0)

    def loss_rope_arg(q, k, v):
        return (pa.flash_attention(q, k, v, window=128, rope=tables).astype(jnp.float32) ** 2).sum()

    def loss_ref(q, k, v):
        return (
            pa.flash_attention(apply_rope(q, *tables), apply_rope(k, *tables), v, window=128).astype(
                jnp.float32
            )
            ** 2
        ).sum()

    with pltpu.force_tpu_interpret_mode():
        o_a = pa.flash_attention(q, k, v, window=128, rope=tables)
        o_r = pa.flash_attention(apply_rope(q, *tables), apply_rope(k, *tables), v, window=128)
        g_a = jax.grad(loss_rope_arg, argnums=(0, 1, 2))(q, k, v)
        g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(o_a), np.asarray(o_r), atol=5e-5, rtol=5e-4)
    for ga, gr, name in zip(g_a, g_r, "qkv"):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gr), atol=1e-4, rtol=1e-3, err_msg=f"d{name}")


def test_dense_stats_windowed_training_grads():
    """Round-5: windowed TRAINING uses dense lane-major stats too — the
    split dq kernel picks its row by q-block id, the split dkv kernel by the
    dynamically VISITED q block (dynamic block index + dynamic in-register
    row pick). H=16 at T=1024 gives nq=16 -> an (8, rows) group; grads vs
    the masked einsum reference."""
    from osufusion_tpu.ops.pallas_attention import _choose_blocks, _dense_stats_group

    q, k, v = make_qkv(B=1, T=1024, H=16, Kv=1, seed=23)
    window = 256
    bq, bk, fold = _choose_blocks(1024, 1024, 16)
    assert _dense_stats_group(1, 1024 // bq, fold * bq) == 8, "shape no longer hits the g=8 group"

    def loss_flash(q, k, v):
        return (pa.flash_attention(q, k, v, window=window).astype(jnp.float32) ** 2).sum()

    def loss_naive(q, k, v):
        return (gqa_attention(q, k, v, window=window).astype(jnp.float32) ** 2).sum()

    with pltpu.force_tpu_interpret_mode():
        out = pa.flash_attention(q, k, v, window=window)
        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(gqa_attention(q, k, v, window=window)), atol=2e-5, rtol=2e-5
    )
    g_naive = jax.grad(loss_naive, argnums=(0, 1, 2))(q, k, v)
    for gf, gn, name in zip(g_flash, g_naive, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gn), atol=2e-3, rtol=2e-3, err_msg=f"d{name} mismatch"
        )


def test_dense_stats_windowed_fused_rope_training_grads():
    """The full full-song training combination: windowed sites + dense stats
    + fused RoPE, grads vs the XLA-rope masked reference."""
    from osufusion_tpu.ops.rope import apply_rope, rope_tables

    q, k, v = make_qkv(B=1, T=1024, H=16, Kv=1, seed=29)
    window = 256
    tables = rope_tables(1024, 64, scale_base=window * 1.0)

    def loss_fused(q, k, v):
        return (pa.flash_attention(q, k, v, window=window, rope=tables).astype(jnp.float32) ** 2).sum()

    def loss_ref(q, k, v):
        return (
            pa.flash_attention(
                apply_rope(q, *tables), apply_rope(k, *tables), v, window=window
            ).astype(jnp.float32)
            ** 2
        ).sum()

    with pltpu.force_tpu_interpret_mode():
        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_fused, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), atol=2e-3, rtol=2e-3, err_msg=f"d{name} mismatch"
        )


def test_dense_stats_layout_engages_and_matches():
    """Lane-major (B*nq, rows) softmax stats (round-5): at shapes where the
    flattened q-block count divides 8 the global path stores LSE densely
    instead of 128x lane-padded, and the fused backward reads one row of an
    (8, rows) block. H=16 fold at T=1024 gives bq=64 -> nq=16: dense engages.
    Forward and all grads must match the einsum reference."""
    from osufusion_tpu.ops.pallas_attention import _choose_blocks, _dense_stats_ok

    q, k, v = make_qkv(B=1, T=1024, H=16, Kv=1, seed=11)
    bq, bk, fold = _choose_blocks(1024, 1024, 16)
    assert _dense_stats_ok(1, 1024 // bq), "shape no longer engages the dense layout; pick another"

    def loss_flash(q, k, v):
        return (pa.flash_attention(q, k, v).astype(jnp.float32) ** 2).sum()

    def loss_naive(q, k, v):
        return (gqa_attention(q, k, v).astype(jnp.float32) ** 2).sum()

    with pltpu.force_tpu_interpret_mode():
        out = pa.flash_attention(q, k, v)
        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    ref = gqa_attention(q, k, v)
    g_naive = jax.grad(loss_naive, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)
    for gf, gn, name in zip(g_flash, g_naive, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gn), atol=2e-3, rtol=2e-3, err_msg=f"d{name} mismatch"
        )


def test_dense_stats_with_fused_rope_grads():
    """Dense stats + fused-RoPE training path together (the production
    combination): grads vs the XLA-rope reference."""
    from osufusion_tpu.ops.rope import apply_rope, rope_tables

    q, k, v = make_qkv(B=1, T=1024, H=16, Kv=1, seed=13)
    tables = rope_tables(1024, 64, scale_base=1024.0)

    def loss_fused(q, k, v):
        return (pa.flash_attention(q, k, v, rope=tables).astype(jnp.float32) ** 2).sum()

    def loss_ref(q, k, v):
        return (
            pa.flash_attention(apply_rope(q, *tables), apply_rope(k, *tables), v).astype(jnp.float32) ** 2
        ).sum()

    with pltpu.force_tpu_interpret_mode():
        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_fused, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), atol=2e-3, rtol=2e-3, err_msg=f"d{name} mismatch"
        )


def test_dense_stats_whole_array_group():
    """Shapes whose flattened q-block count does NOT divide 8 (the full-song
    inference length T=22656 -> nq=354 is one) fall back to ONE whole-array
    stats block resident in VMEM. T=768/H=16 gives nq=12: exercises that
    branch, forward + grads vs reference."""
    from osufusion_tpu.ops.pallas_attention import _choose_blocks, _dense_stats_group

    q, k, v = make_qkv(B=1, T=768, H=16, Kv=1, seed=17)
    bq, bk, fold = _choose_blocks(768, 768, 16)
    g = _dense_stats_group(1, 768 // bq, fold * bq)
    assert g == 768 // bq and g % 8 != 0, f"expected the whole-array group, got g={g}"

    def loss_flash(q, k, v):
        return (pa.flash_attention(q, k, v).astype(jnp.float32) ** 2).sum()

    def loss_naive(q, k, v):
        return (gqa_attention(q, k, v).astype(jnp.float32) ** 2).sum()

    with pltpu.force_tpu_interpret_mode():
        out = pa.flash_attention(q, k, v)
        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(gqa_attention(q, k, v)), atol=2e-5, rtol=2e-5)
    g_naive = jax.grad(loss_naive, argnums=(0, 1, 2))(q, k, v)
    for gf, gn, name in zip(g_flash, g_naive, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gn), atol=2e-3, rtol=2e-3, err_msg=f"d{name} mismatch"
        )


def test_dense_stats_windowed_inference_forward():
    """Forward-only windowed inference (the full-song sampler's regime) uses
    dense stats too — output must match the masked reference."""
    from osufusion_tpu.ops.pallas_attention import inference_attention

    q, k, v = make_qkv(B=1, T=768, H=16, Kv=1, seed=19, dtype=jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
        with inference_attention():
            out = pa.flash_attention(q, k, v, window=256)
    ref = gqa_attention(q, k, v, window=256)
    err = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32)).max()
    assert err < 0.03, f"windowed dense inference error {err}"

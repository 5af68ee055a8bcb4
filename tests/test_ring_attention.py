"""Ring attention (global attention over a sequence-sharded mesh axis) must
match the single-chip global flash kernel — forward and gradients — on the
8-virtual-device CPU mesh in pallas interpret mode. This is the path that
keeps DiT layers and the UNet's at-or-below-context levels sharded on a seq
mesh (parallel/ring.py); the windowed regime is test_sequence_parallel.py's
halo path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh

from osufusion_tpu.ops import pallas_attention as pa
from osufusion_tpu.parallel.ring import ring_attention, ring_available


def seq_mesh(n):
    devs = np.asarray(jax.devices()[:n])
    return Mesh(devs, axis_names=("seq",))


def make_qkv(B=1, T=512, H=2, Kv=1, D=64, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(0, 1, (B, T, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (B, T, Kv, D)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (B, T, Kv, D)), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_ring_forward_matches_single_chip(n_shards):
    q, k, v = make_qkv(T=512)
    with pltpu.force_tpu_interpret_mode():
        ref = pa.flash_attention(q, k, v)  # global
        got = ring_attention(q, k, v, seq_mesh(n_shards))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_ring_backward_matches_single_chip():
    q, k, v = make_qkv(T=256, seed=1)
    mesh = seq_mesh(4)

    def loss_ring(q, k, v):
        return (ring_attention(q, k, v, mesh) * 0.01).sum()

    def loss_ref(q, k, v):
        return (pa.flash_attention(q, k, v) * 0.01).sum()

    with pltpu.force_tpu_interpret_mode():
        g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gs, gr, name in zip(g_ring, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gs), np.asarray(gr), atol=5e-5, rtol=5e-4,
            err_msg=f"d{name} mismatch (travelling dk/dv accumulators)",
        )


def test_ring_gqa():
    q, k, v = make_qkv(T=256, H=4, Kv=2, seed=2)
    with pltpu.force_tpu_interpret_mode():
        ref = pa.flash_attention(q, k, v)
        got = ring_attention(q, k, v, seq_mesh(2))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_ring_full_mha_timestep_fold():
    """Full-MHA (H == Kv, the DiT backbones) ring shards run per-head H=1
    slices that the kernel serves by folding timesteps into the row dim —
    fwd AND bwd must match the single-chip global kernel."""
    q, k, v = make_qkv(T=512, H=4, Kv=4, seed=3)
    mesh = seq_mesh(2)
    assert ring_available(512, 512, 64, None, 2, 4, 4)

    def loss_ring(q, k, v):
        return (ring_attention(q, k, v, mesh) * 0.01).sum()

    def loss_ref(q, k, v):
        return (pa.flash_attention(q, k, v) * 0.01).sum()

    with pltpu.force_tpu_interpret_mode():
        ref = pa.flash_attention(q, k, v)
        got = ring_attention(q, k, v, mesh)
        g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5)
    for gs, gr, name in zip(g_ring, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gs), np.asarray(gr), atol=5e-5, rtol=5e-4, err_msg=f"d{name} mismatch"
        )


def test_ring_availability_rules():
    # engaged window -> halo's job, ring refuses
    assert not ring_available(512, 512, 64, 128, 4)
    # window covering the whole sequence IS the global regime
    assert ring_available(512, 512, 64, 512, 4)
    assert ring_available(512, 512, 64, None, 4)
    # shards must tile the kernel (T_local 64-divisible), axis must exist
    assert not ring_available(512, 512, 64, None, 1)
    assert not ring_available(256, 256, 64, None, 8)  # T_local = 32
    assert not ring_available(512, 256, 64, None, 4)  # cross-attention
    assert not ring_available(512, 512, 48, None, 4)  # lane-hostile head dim


def test_ring_train_step_matches_dp():
    """Full tiny-UNet train step on a data x seq mesh vs pure DP, with
    attn_context_len = T so EVERY attention site is global: level 0
    (T=256, t_local=128) and level 1 (T=128, t_local=64) both take the ring
    path. Sequence sharding through rings must stay a layout choice."""
    from osufusion_tpu.config import Config, DiffusionConfig, ModelConfig, TrainConfig
    from osufusion_tpu.models import build_model
    from osufusion_tpu.parallel import make_mesh
    from osufusion_tpu.train.loop import init_state, make_train_step, shard_state

    model_cfg = ModelConfig(
        dim_h=32,
        dim_h_mult=(1, 2),
        num_layer_blocks=(1, 1),
        num_middle_transformers=1,
        attn_dim_head=64,
        attn_heads=2,
        attn_kv_heads=1,
        attn_context_len=256,
        dtype="float32",
    )
    rng = np.random.default_rng(0)
    B, T = 2, 256
    batch = (
        rng.uniform(-1, 1, (B, 6, T)).astype(np.float32),
        rng.normal(-10, 1, (B, 96, T)).astype(np.float32),
        rng.uniform(-1, 1, (B, 5)).astype(np.float32),
        np.full(B, T, dtype=np.int32),
    )

    results = []
    with pltpu.force_tpu_interpret_mode():
        for d, s in [(2, 1), (2, 2)]:
            cfg = Config(
                model=model_cfg,
                diffusion=DiffusionConfig(),
                train=TrainConfig(total_steps=10, warmup_steps=2, lr=1e-3, batch_size=B),
            )
            model = build_model(cfg.model, cfg.diffusion)
            mesh = make_mesh(data=d, seq=s, model=1)
            state = init_state(model, cfg, jax.random.PRNGKey(0), seq_len=64)
            state, _ = shard_state(state, mesh)
            step = make_train_step(model, cfg, mesh)
            state, metrics = step(state, batch)
            results.append(
                (float(metrics["loss"]), jax.tree.map(np.asarray, jax.device_get(state.params)))
            )

    (loss_dp, p_dp), (loss_sp, p_sp) = results
    assert loss_dp == pytest.approx(loss_sp, rel=1e-4)
    for a, b in zip(jax.tree.leaves(p_dp), jax.tree.leaves(p_sp)):
        np.testing.assert_allclose(a, b, atol=5e-5, rtol=5e-4)


@pytest.mark.parametrize("backbone", ["dit", "mmdit"])
def test_ring_train_step_transformer_backbones_match_dp(backbone):
    """DiT/MMDiT attend globally at EVERY layer (no window arg in their sdpa
    calls — reference dit.py:108-116 / mmdit.py:65-127), so on a seq mesh the
    ring path is the only thing keeping their activations frame-sharded.
    A train step on data x seq must match pure DP: DiT rings at T_local=128
    (MHA -> one ring per head-slice), MMDiT rings the PACKED [audio; osu]
    token axis at T_local=64 with kv_heads=2 (one ring per KV head)."""
    from osufusion_tpu.config import Config, DiffusionConfig, ModelConfig, TrainConfig
    from osufusion_tpu.models import build_model
    from osufusion_tpu.parallel import make_mesh
    from osufusion_tpu.train.loop import init_state, make_train_step, shard_state

    model_cfg = ModelConfig(
        backbone=backbone,
        dim_h=128,
        depth=2,
        patch_size=4,
        attn_dim_head=64,
        attn_heads=2,
        attn_kv_heads=2,
        attn_context_len=256,
        dtype="float32",
    )
    rng = np.random.default_rng(0)
    B, T = 2, 256
    batch = (
        rng.uniform(-1, 1, (B, 6, T)).astype(np.float32),
        rng.normal(-10, 1, (B, 96, T)).astype(np.float32),
        rng.uniform(-1, 1, (B, 5)).astype(np.float32),
        np.full(B, T, dtype=np.int32),
    )

    results = []
    with pltpu.force_tpu_interpret_mode():
        for d, s in [(2, 1), (2, 2)]:
            cfg = Config(
                model=model_cfg,
                diffusion=DiffusionConfig(),
                train=TrainConfig(total_steps=10, warmup_steps=2, lr=1e-3, batch_size=B),
            )
            model = build_model(cfg.model, cfg.diffusion)
            mesh = make_mesh(data=d, seq=s, model=1)
            state = init_state(model, cfg, jax.random.PRNGKey(0), seq_len=64)
            state, _ = shard_state(state, mesh)
            step = make_train_step(model, cfg, mesh)
            state, metrics = step(state, batch)
            results.append(
                (float(metrics["loss"]), jax.tree.map(np.asarray, jax.device_get(state.params)))
            )

    (loss_dp, p_dp), (loss_sp, p_sp) = results
    assert loss_dp == pytest.approx(loss_sp, rel=1e-4)
    for a, b in zip(jax.tree.leaves(p_dp), jax.tree.leaves(p_sp)):
        np.testing.assert_allclose(a, b, atol=5e-5, rtol=5e-4)


def test_ring_dispatch_from_sdpa():
    """sdpa under an ambient seq mesh must route global sites through the
    ring (staying sharded) and produce the XLA einsum path's numbers."""
    from osufusion_tpu.ops.attention import gqa_attention, sdpa

    q, k, v = make_qkv(T=256, seed=3)
    ref = gqa_attention(q, k, v)
    with pltpu.force_tpu_interpret_mode(), jax.sharding.set_mesh(seq_mesh(2)):
        got = sdpa(q, k, v, backend="pallas", window=None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5)

"""Sequence-parallel windowed attention: the shard_map + halo-exchange path
must match the single-chip windowed flash kernel bit-for-bit in semantics
(truncated windows at sequence edges included), forward and backward, on the
8-virtual-device CPU mesh in pallas interpret mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh

from osufusion_tpu.ops import pallas_attention as pa
from osufusion_tpu.parallel.sequence import sequence_parallel_attention


def seq_mesh(n):
    devs = np.asarray(jax.devices()[:n])
    return Mesh(devs, axis_names=("seq",))


def make_qkv(B=1, T=512, H=2, Kv=1, D=64, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(0, 1, (B, T, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (B, T, Kv, D)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (B, T, Kv, D)), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("n_shards", [2, 4])
def test_seq_parallel_forward_matches_single_chip(n_shards):
    window = 128
    q, k, v = make_qkv(T=512)
    with pltpu.force_tpu_interpret_mode():
        ref = pa.flash_attention(q, k, v, window=window)
        got = sequence_parallel_attention(q, k, v, window, seq_mesh(n_shards))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_seq_parallel_edge_truncation():
    """First/last shard queries have TRUNCATED windows (no wrap): compare a
    window big enough that halos cross shard boundaries everywhere."""
    window = 256  # w2 = 128 = T_local at 4 shards: maximal halo
    q, k, v = make_qkv(T=512, seed=3)
    with pltpu.force_tpu_interpret_mode():
        ref = pa.flash_attention(q, k, v, window=window)
        got = sequence_parallel_attention(q, k, v, window, seq_mesh(4))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_seq_parallel_backward_matches_single_chip():
    window = 128
    q, k, v = make_qkv(T=512, seed=1)
    mesh = seq_mesh(4)

    def loss_sp(q, k, v):
        return (sequence_parallel_attention(q, k, v, window, mesh) * 0.01).sum()

    def loss_ref(q, k, v):
        return (pa.flash_attention(q, k, v, window=window) * 0.01).sum()

    with pltpu.force_tpu_interpret_mode():
        g_sp = jax.grad(loss_sp, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gs, gr, name in zip(g_sp, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gs), np.asarray(gr), atol=5e-5, rtol=5e-4,
            err_msg=f"d{name} mismatch (halo gradient routing)",
        )


def test_seq_parallel_gqa():
    window = 128
    q, k, v = make_qkv(T=512, H=4, Kv=2, seed=2)
    with pltpu.force_tpu_interpret_mode():
        ref = pa.flash_attention(q, k, v, window=window)
        got = sequence_parallel_attention(q, k, v, window, seq_mesh(2))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_seq_parallel_train_step_matches_dp():
    """Full tiny-UNet train step on a data x seq mesh vs pure DP: sequence
    sharding (halo attention + GSPMD-partitioned convs/norms) is a layout
    choice, not a math change. T=256 > ctx=64 so windows engage and the
    level-0 attention actually takes the halo path (level 1's 32-frame
    shards don't tile — it falls back to the gathered kernel, also correct)."""
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
        attn_context_len=64,
        dtype="float32",  # backend "auto": halo kernels at seq-shardable
        # sites, XLA einsum elsewhere (interpret-mode flash can't run
        # REPLICATED under a partitioned jit — only manual/shard_map'd)
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
        # pure DP; data x seq; and the full 3-D data x seq x model mesh —
        # all three axes composed in one step must stay a layout choice
        for d, s, m in [(2, 1, 1), (2, 4, 1), (2, 2, 2)]:
            cfg = Config(
                model=model_cfg,
                diffusion=DiffusionConfig(),
                train=TrainConfig(total_steps=10, warmup_steps=2, lr=1e-3, batch_size=B),
            )
            model = build_model(cfg.model, cfg.diffusion)
            mesh = make_mesh(data=d, seq=s, model=m)
            state = init_state(model, cfg, jax.random.PRNGKey(0), seq_len=64)
            state, _ = shard_state(state, mesh)
            step = make_train_step(model, cfg, mesh)
            state, metrics = step(state, batch)
            results.append(
                (float(metrics["loss"]), jax.tree.map(np.asarray, jax.device_get(state.params)))
            )

    (loss_dp, p_dp) = results[0]
    for loss_sp, p_sp in results[1:]:
        assert loss_dp == pytest.approx(loss_sp, rel=1e-4)
        for a, b in zip(jax.tree.leaves(p_dp), jax.tree.leaves(p_sp)):
            np.testing.assert_allclose(a, b, atol=5e-5, rtol=5e-4)


def test_seq_parallel_single_shard_degenerate():
    """n=1 'mesh' pads zeros instead of permuting; bounds mask must still
    reproduce the plain windowed kernel."""
    window = 128
    q, k, v = make_qkv(T=256, seed=4)
    with pltpu.force_tpu_interpret_mode():
        ref = pa.flash_attention(q, k, v, window=window)
        got = sequence_parallel_attention(q, k, v, window, seq_mesh(1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5)

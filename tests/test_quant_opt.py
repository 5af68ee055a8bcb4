"""Blockwise-int8 Adam moment storage (train/quant_opt.py): quantizer error
bounds, optimizer-trajectory agreement with exact AdamW, memory accounting,
and sharded train-step integration on the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from osufusion_tpu.config import Config, DiffusionConfig, TrainConfig
from osufusion_tpu.models import build_model
from osufusion_tpu.parallel import make_mesh
from osufusion_tpu.train.loop import init_state, make_train_step, shard_state
from osufusion_tpu.train.quant_opt import (
    BLOCK,
    adamw_int8,
    dequantize_blockwise,
    quantize_blockwise,
    scale_by_adam_int8,
)

from test_train import np_batch, tiny_config


def test_quantize_roundtrip_error_bound():
    """Per-block linear absmax: |x - dq(q(x))| <= blockmax/127/2 + eps, for
    shapes that are and are not multiples of the block size, including
    all-zero blocks and negative values."""
    rng = np.random.default_rng(0)
    for shape in [(BLOCK * 3,), (BLOCK * 2 + 17,), (7, 33), (1,), (128, 128)]:
        x = rng.normal(0, 1, shape).astype(np.float32) * rng.uniform(1e-6, 10)
        q, s = quantize_blockwise(jnp.asarray(x))
        assert q.shape == x.shape and q.dtype == jnp.int8
        back = np.asarray(dequantize_blockwise(q, s))
        n = x.size
        nb = -(-n // BLOCK)
        fb = np.pad(x.reshape(-1), (0, nb * BLOCK - n)).reshape(nb, BLOCK)
        bound = np.repeat(np.abs(fb).max(axis=1) / 127.0 * 0.5 + 1e-12, BLOCK)[:n]
        assert np.all(np.abs(back.reshape(-1) - x.reshape(-1)) <= bound + 1e-9)

    # all-zero input quantizes to exact zeros (safe divide, zero scale)
    q, s = quantize_blockwise(jnp.zeros((BLOCK + 3,)))
    assert np.all(np.asarray(dequantize_blockwise(q, s)) == 0.0)


def test_int8_adam_tracks_exact_adam():
    """On a deterministic quadratic, int8-moment AdamW must follow exact
    AdamW closely (moment quantization is a storage precision choice, not a
    different algorithm) and reach the same optimum region."""
    A = jnp.asarray(np.random.default_rng(1).normal(0, 1, (16, 16)), jnp.float32)
    target = jnp.ones((16,))

    def loss_fn(w):
        return jnp.sum((A @ w - target) ** 2)

    def run(tx, steps=200):
        w = jnp.zeros((16,))
        opt = tx.init(w)
        traj = []
        for _ in range(steps):
            g = jax.grad(loss_fn)(w)
            u, opt = tx.update(g, opt, w)
            w = optax.apply_updates(w, u)
            traj.append(float(loss_fn(w)))
        return w, traj

    w_exact, tr_exact = run(optax.adamw(1e-2))
    w_q, tr_q = run(adamw_int8(1e-2))
    assert tr_q[-1] < tr_exact[0] * 1e-2  # actually optimizes
    # trajectories agree to a few percent throughout
    rel = np.abs(np.array(tr_q) - np.array(tr_exact)) / (np.array(tr_exact) + 1e-6)
    assert np.median(rel) < 0.05, float(np.median(rel))
    np.testing.assert_allclose(np.asarray(w_q), np.asarray(w_exact), atol=0.05)


def test_int8_state_memory_is_quartered():
    """Moment storage drops from 2 f32 tensors (8 bytes/param) to 2 int8
    tensors + per-256-block f32 scales (~2.03 bytes/param)."""
    params = {"w": jnp.zeros((4096, 512)), "b": jnp.zeros((512,))}
    n = sum(p.size for p in jax.tree.leaves(params))

    exact = optax.scale_by_adam().init(params)
    qstate = scale_by_adam_int8().init(params)
    exact_bytes = sum(x.nbytes for x in jax.tree.leaves(exact))
    q_bytes = sum(x.nbytes for x in jax.tree.leaves(qstate))
    assert exact_bytes >= 8 * n
    assert q_bytes <= 2.1 * n
    assert q_bytes < exact_bytes / 3.5


def test_train_step_with_int8_moments_on_mesh():
    """Full sharded train step with opt_moments='int8' on the 8-device mesh:
    loss decreases, quantized moments inherit the params' sharding (ZeRO-1
    over data), scales stay replicated."""
    cfg = tiny_config(opt_moments="int8")
    model = build_model(cfg.model, cfg.diffusion)
    mesh = make_mesh(data=8, model=1)
    state = init_state(model, cfg, jax.random.PRNGKey(0), seq_len=64)
    state, _ = shard_state(state, mesh)
    step = make_train_step(model, cfg, mesh)

    batch = np_batch()
    losses = []
    for _ in range(24):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert np.mean(losses[-6:]) < np.mean(losses[:6])

    # placement: find the AdamInt8State inside the chain state
    from osufusion_tpu.train.quant_opt import AdamInt8State

    adam_states = [
        s for s in jax.tree.leaves(state.opt_state, is_leaf=lambda x: isinstance(x, AdamInt8State))
        if isinstance(s, AdamInt8State)
    ]
    assert len(adam_states) == 1
    st = adam_states[0]
    mq_leaves = jax.tree.leaves(st.mu_q)
    assert all(q.dtype == jnp.int8 for q in mq_leaves)
    # at least one big moment tensor is actually sharded over the data axis
    sharded = [
        q for q in mq_leaves if not q.sharding.is_fully_replicated and q.size >= 8
    ]
    assert sharded, "ZeRO-1 placement did not engage for int8 moments"
    for s_leaf in jax.tree.leaves(st.mu_s):
        assert s_leaf.sharding.is_fully_replicated

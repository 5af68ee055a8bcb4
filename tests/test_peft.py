"""LoRA/DoRA overlay tests: identity at init, gradient isolation, merge."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from osufusion_tpu.config import DiffusionConfig, ModelConfig
from osufusion_tpu.models import DiffusionModel
from osufusion_tpu.peft import LoraConfig, apply_lora, count_lora_params, init_lora, merge_lora

TINY = ModelConfig(
    dim_h=32,
    dim_h_mult=(1, 2),
    num_layer_blocks=(1, 1),
    num_middle_transformers=1,
    attn_dim_head=16,
    attn_heads=4,
    attn_kv_heads=1,
    attn_context_len=64,
    dtype="float32",
)


@pytest.fixture(scope="module")
def model_and_params():
    model = DiffusionModel(TINY, DiffusionConfig())
    params = model.init_params(jax.random.PRNGKey(0), seq_len=64)
    # the output conv is zero-init, which makes a fresh model's output (and all
    # upstream gradients) identically zero — randomize it so grads flow
    fc = params["params"]["final_conv"]
    fc["kernel"] = jax.random.normal(jax.random.PRNGKey(9), fc["kernel"].shape) * 0.1
    return model, params


def test_targets_matched(model_and_params):
    _, params = model_and_params
    adapters = init_lora(params, LoraConfig(r=4), jax.random.PRNGKey(1))
    paths = list(adapters)
    assert any("to_q" in p for p in paths)
    assert any("to_kv" in p for p in paths)
    assert any("to_out" in p for p in paths)
    assert any("FiLMBlock_0" in p for p in paths)
    assert any("FiLMBlock_1" in p for p in paths)
    trainable, n_layers = count_lora_params(adapters)
    total = sum(p.size for p in jax.tree.leaves(params))
    assert 0 < trainable < total * 0.5


@pytest.mark.parametrize("use_dora", [False, True])
def test_identity_at_init(model_and_params, use_dora):
    """B=0 at init: adapted forward must equal the base forward exactly."""
    model, params = model_and_params
    cfg = LoraConfig(r=4, use_dora=use_dora)
    adapters = init_lora(params, cfg, jax.random.PRNGKey(1))
    eff = apply_lora(params, adapters, cfg)

    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 6, 64), minval=-1, maxval=1)
    a = jax.random.normal(jax.random.PRNGKey(3), (1, 96, 64))
    c = jnp.zeros((1, 5))
    loss_base = model.loss(params, jax.random.PRNGKey(4), x, a, c)
    loss_eff = model.loss(eff, jax.random.PRNGKey(4), x, a, c)
    np.testing.assert_allclose(float(loss_base), float(loss_eff), rtol=1e-5)


def test_gradients_flow_to_adapters_only(model_and_params):
    model, params = model_and_params
    cfg = LoraConfig(r=4, use_dora=True)
    adapters = init_lora(params, cfg, jax.random.PRNGKey(1))

    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 6, 64), minval=-1, maxval=1)
    a = jax.random.normal(jax.random.PRNGKey(3), (1, 96, 64))
    c = jnp.zeros((1, 5))

    def loss_fn(adapters):
        eff = apply_lora(params, adapters, cfg)
        return model.loss(eff, jax.random.PRNGKey(4), x, a, c)

    grads = jax.grad(loss_fn)(adapters)
    # B starts at zero so dL/dA = 0 at init, but dL/dB and dL/dm are nonzero
    gb = sum(float(jnp.abs(e["b"]).sum()) for e in grads.values())
    gm = sum(float(jnp.abs(e["m"]).sum()) for e in grads.values())
    assert gb > 0
    assert gm > 0


def test_train_adapters_reduces_loss(model_and_params):
    model, params = model_and_params
    cfg = LoraConfig(r=4, use_dora=True)
    adapters = init_lora(params, cfg, jax.random.PRNGKey(1))

    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 6, 64), minval=-1, maxval=1)
    a = jax.random.normal(jax.random.PRNGKey(3), (2, 96, 64))
    c = jnp.zeros((2, 5))

    @jax.jit
    def step(adapters, key):
        def loss_fn(ad):
            return model.loss(apply_lora(params, ad, cfg), key, x, a, c)

        loss, grads = jax.value_and_grad(loss_fn)(adapters)
        adapters = jax.tree.map(lambda p, g: p - 1e-2 * g, adapters, grads)
        return adapters, loss

    losses = []
    for i in range(20):
        adapters, loss = step(adapters, jax.random.PRNGKey(i % 3))
        losses.append(float(loss))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_merge_bakes_adapters(model_and_params):
    model, params = model_and_params
    cfg = LoraConfig(r=4, use_dora=True)
    adapters = init_lora(params, cfg, jax.random.PRNGKey(1))
    # perturb B so the adapter is non-trivial
    adapters = jax.tree.map(lambda v: v + 0.01, adapters)

    merged = merge_lora(params, adapters, cfg)
    eff = apply_lora(params, adapters, cfg)
    for m, e in zip(jax.tree.leaves(merged), jax.tree.leaves(eff)):
        np.testing.assert_allclose(np.asarray(m), np.asarray(e), rtol=1e-6)

    # merged model runs standalone
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 6, 64), minval=-1, maxval=1)
    a = jax.random.normal(jax.random.PRNGKey(3), (1, 96, 64))
    c = jnp.zeros((1, 5))
    loss = model.loss(merged, jax.random.PRNGKey(4), x, a, c)
    assert jnp.isfinite(loss)


def test_sharded_peft_step(model_and_params):
    """BASELINE config 5: one adapter train step sharded over a data x model
    mesh — base params on TP shardings, batch over data, adapters replicated,
    moments ZeRO-1 sharded."""
    import optax

    from osufusion_tpu.parallel import make_mesh
    from trainer_peft import make_peft_step, shard_peft

    model, params = model_and_params
    cfg = LoraConfig(r=4, use_dora=True)
    adapters = init_lora(params, cfg, jax.random.PRNGKey(1))
    tx = optax.adamw(1e-3)
    opt_state = tx.init(adapters)

    mesh = make_mesh(data=4, model=2)
    base_params, adapters, opt_state = shard_peft(params, adapters, opt_state, mesh)

    # adapters replicated; at least one AdamW moment actually sharded over data
    for leaf in jax.tree.leaves(adapters):
        assert leaf.sharding.spec == jax.sharding.PartitionSpec()
    moment_specs = [
        leaf.sharding.spec
        for node in jax.tree.leaves(opt_state, is_leaf=lambda n: isinstance(n, dict))
        if isinstance(node, dict)
        for leaf in jax.tree.leaves(node)
    ]
    assert any("data" in spec for spec in moment_specs), f"no ZeRO-sharded moment found: {moment_specs[:4]}"

    step_fn = make_peft_step(model, cfg, tx, mesh)
    x = np.random.default_rng(0).uniform(-1, 1, (4, 6, 64)).astype(np.float32)
    a = np.random.default_rng(1).normal(-10, 1, (4, 96, 64)).astype(np.float32)
    c = np.zeros((4, 5), dtype=np.float32)
    ol = np.full(4, 64, dtype=np.int32)
    rng = jax.random.PRNGKey(0)

    before = jax.tree.map(np.asarray, adapters)
    adapters, opt_state, rng, loss, grad_norm = step_fn(adapters, opt_state, base_params, rng, (x, a, c, ol))
    assert np.isfinite(float(loss))
    assert float(grad_norm) > 0
    moved = sum(
        float(np.abs(np.asarray(n) - b).sum()) for n, b in zip(jax.tree.leaves(adapters), jax.tree.leaves(before))
    )
    assert moved > 0, "adapters did not update"


def test_merge_nan_safety(model_and_params):
    _, params = model_and_params
    cfg = LoraConfig(r=4, use_dora=False)
    adapters = init_lora(params, cfg, jax.random.PRNGKey(1))
    bad = {k: dict(v) for k, v in adapters.items()}
    first = next(iter(bad))
    bad[first]["b"] = bad[first]["b"].at[0, 0].set(jnp.nan)
    with pytest.raises(ValueError, match="NaNs detected"):
        merge_lora(params, bad, cfg)


def test_overlay_replicated_merge_is_jit_safe(model_and_params):
    """trainer_peft's final merged-model export routes merge_lora through a
    collective jit (_overlay_replicated). merge_lora's concrete-bool NaN
    check cannot trace — regression pin for the TracerBoolConversionError the
    2-process PEFT worker exposed (the check now runs host-side on the
    gathered result, same raise-on-NaN contract)."""
    from osufusion_tpu.parallel import make_mesh
    from osufusion_tpu.parallel.mesh import host_put, param_shardings, replicated
    from trainer_peft import _overlay_replicated

    _, raw_params = model_and_params
    cfg = LoraConfig(r=4, use_dora=False)
    mesh = make_mesh(data=jax.device_count())
    params = host_put(raw_params, param_shardings(raw_params, mesh))
    adapters = init_lora(params, cfg, jax.random.PRNGKey(1))
    rep = replicated(mesh)
    adapters = host_put(adapters, jax.tree.map(lambda _: rep, adapters))

    merged = _overlay_replicated(merge_lora, params, adapters, cfg, mesh)
    ref = merge_lora(params, adapters, cfg)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(merged)[0]), np.asarray(jax.tree.leaves(ref)[0]), rtol=1e-6
    )

    bad = {k: dict(v) for k, v in adapters.items()}
    first = next(iter(bad))
    bad[first]["b"] = bad[first]["b"].at[0, 0].set(jnp.nan)
    with pytest.raises(ValueError, match="NaNs detected"):
        _overlay_replicated(merge_lora, params, bad, cfg, mesh)


def test_peft_grad_accumulation_equivalence(model_and_params):
    """make_peft_step(accum=2) must equal the hand-computed two-micro-batch
    average: same rng split tree, same averaged grads, same optimizer update
    (reference trainer_peft.py:390 --gradient-accumulation-steps)."""
    import optax

    from osufusion_tpu.parallel import make_mesh
    from trainer_peft import make_peft_step, shard_peft

    model, params = model_and_params
    cfg = LoraConfig(r=4, use_dora=True)
    adapters = init_lora(params, cfg, jax.random.PRNGKey(1))
    tx = optax.adamw(1e-3)
    opt_state = tx.init(adapters)
    mesh = make_mesh(data=4, model=1)
    base_params, adapters, opt_state = shard_peft(params, adapters, opt_state, mesh)

    rng = jax.random.PRNGKey(0)
    r = np.random.default_rng(0)
    x = r.uniform(-1, 1, (2, 4, 6, 64)).astype(np.float32)
    a = r.normal(-10, 1, (2, 4, 96, 64)).astype(np.float32)
    c = np.zeros((2, 4, 5), dtype=np.float32)
    ol = np.full((2, 4), 64, dtype=np.int32)

    # hand-rolled reference: same split tree as the jitted step
    _, rng_step = jax.random.split(rng)
    rngs = jax.random.split(rng_step, 2)

    def loss_fn(ad, key, mb):
        mx, ma, mc, mol = mb
        return model.loss(apply_lora(params, ad, cfg), key, mx, ma, mc, mol)

    ad_host = jax.tree.map(np.asarray, adapters)
    g0 = jax.grad(loss_fn)(ad_host, rngs[0], (x[0], a[0], c[0], ol[0]))
    g1 = jax.grad(loss_fn)(ad_host, rngs[1], (x[1], a[1], c[1], ol[1]))
    grads_ref = jax.tree.map(lambda u, v: (u + v) / 2, g0, g1)
    updates, _ = tx.update(grads_ref, tx.init(ad_host), ad_host)
    expect = optax.apply_updates(ad_host, updates)

    step_fn = make_peft_step(model, cfg, tx, mesh, accum=2)
    adapters, opt_state, rng, loss, grad_norm = step_fn(adapters, opt_state, base_params, rng, (x, a, c, ol))
    assert np.isfinite(float(loss))
    for got, want in zip(jax.tree.leaves(adapters), jax.tree.leaves(expect)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-4)


def test_adapter_checkpoint_pruning(tmp_path):
    """--max-num-checkpoints prunes loras/checkpoint-* to the newest N
    (reference trainer_peft.py:160-165)."""
    from trainer_peft import prune_adapter_checkpoints

    for s in (100, 200, 300, 1000, 2000):
        (tmp_path / "loras" / f"checkpoint-{s}").mkdir(parents=True)
    prune_adapter_checkpoints(tmp_path, 2)
    left = sorted(p.name for p in (tmp_path / "loras").glob("checkpoint-*"))
    assert left == ["checkpoint-1000", "checkpoint-2000"]


def test_adapter_optimizer_structure_check(tmp_path, model_and_params):
    """Loading an optimizer sidecar saved under a different optax chain must
    fail loudly, not silently unflatten moments by leaf order."""
    import optax

    from trainer_peft import load_adapter_checkpoint, save_adapter_checkpoint

    _, params = model_and_params
    cfg = LoraConfig(r=4)
    adapters = init_lora(params, cfg, jax.random.PRNGKey(1))
    tx1 = optax.adamw(1e-3)
    save_adapter_checkpoint(adapters, tx1.init(adapters), 10, tmp_path, cfg)

    tx2 = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-3))
    with pytest.raises(ValueError, match="different optax chain"):
        load_adapter_checkpoint(tmp_path / "loras" / "checkpoint-10", adapters, tx2.init(adapters))

    # and the matching chain round-trips
    ad2, opt2, step = load_adapter_checkpoint(
        tmp_path / "loras" / "checkpoint-10", adapters, tx1.init(adapters)
    )
    assert step == 10
    for got, want in zip(jax.tree.leaves(ad2), jax.tree.leaves(adapters)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fp8_peft_step(model_and_params):
    """--mixed-precision fp8 on the PEFT CLI: an adapter step through the
    quantized Dense dots trains to a finite loss."""
    import dataclasses

    import optax

    from osufusion_tpu.models import build_model
    from osufusion_tpu.ops.quant import set_quantization
    from osufusion_tpu.parallel import make_mesh
    from trainer_peft import make_peft_step, shard_peft

    from osufusion_tpu.config import DiffusionConfig

    model = build_model(dataclasses.replace(TINY, dtype="bfloat16", quant="fp8"), DiffusionConfig())
    try:
        params = model.init_params(jax.random.PRNGKey(0), seq_len=64)
        # zero-init output conv kills all upstream grads (see model_and_params)
        fc = params["params"]["final_conv"]
        fc["kernel"] = jax.random.normal(jax.random.PRNGKey(9), fc["kernel"].shape) * 0.1
        cfg = LoraConfig(r=4, use_dora=True)
        adapters = init_lora(params, cfg, jax.random.PRNGKey(1))
        tx = optax.adamw(1e-3)
        opt_state = tx.init(adapters)
        mesh = make_mesh(data=4, model=1)
        base_params, adapters, opt_state = shard_peft(params, adapters, opt_state, mesh)
        step_fn = make_peft_step(model, cfg, tx, mesh)
        r = np.random.default_rng(0)
        batch = (
            r.uniform(-1, 1, (4, 6, 64)).astype(np.float32),
            r.normal(-10, 1, (4, 96, 64)).astype(np.float32),
            np.zeros((4, 5), dtype=np.float32),
            np.full(4, 64, dtype=np.int32),
        )
        adapters, opt_state, _, loss, grad_norm = step_fn(
            adapters, opt_state, base_params, jax.random.PRNGKey(0), batch
        )
        assert np.isfinite(float(loss))
        assert float(grad_norm) > 0
    finally:
        set_quantization("none")


def test_remat_peft_step(model_and_params):
    """--gradient-checkpointing on the PEFT CLI: the rematted model's adapter
    step matches the un-rematted one (remat is a memory choice, not math)."""
    import dataclasses

    import optax

    from osufusion_tpu.models import build_model
    from osufusion_tpu.parallel import make_mesh
    from trainer_peft import make_peft_step, shard_peft

    from osufusion_tpu.config import DiffusionConfig

    losses = []
    for remat in (False, True):
        model = build_model(dataclasses.replace(TINY, remat=remat), DiffusionConfig())
        params = model.init_params(jax.random.PRNGKey(0), seq_len=64)
        cfg = LoraConfig(r=4, use_dora=True)
        adapters = init_lora(params, cfg, jax.random.PRNGKey(1))
        tx = optax.adamw(1e-3)
        opt_state = tx.init(adapters)
        mesh = make_mesh(data=4, model=1)
        base_params, adapters, opt_state = shard_peft(params, adapters, opt_state, mesh)
        step_fn = make_peft_step(model, cfg, tx, mesh)
        r = np.random.default_rng(0)
        batch = (
            r.uniform(-1, 1, (4, 6, 64)).astype(np.float32),
            r.normal(-10, 1, (4, 96, 64)).astype(np.float32),
            np.zeros((4, 5), dtype=np.float32),
            np.full(4, 64, dtype=np.int32),
        )
        adapters, opt_state, _, loss, _ = step_fn(
            adapters, opt_state, base_params, jax.random.PRNGKey(0), batch
        )
        losses.append(float(loss))
    assert losses[0] == pytest.approx(losses[1], rel=1e-5)

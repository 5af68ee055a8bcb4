"""Numeric parity vs the PyTorch reference (BASELINE config 2).

Builds the reference UNet (imported read-only from /root/reference) and our
JAX UNet at the tiny 2-block/64-dim config, transplants the torch weights
into the flax param tree, and checks forward outputs and input gradients
match in fp32. The reference's ``Attend`` hard-requires CUDA state at
forward time, so the test patches it to a plain fp32 SDPA on CPU — both
sides then compute the same math in the same precision.

Skipped automatically if torch or the reference checkout is unavailable.
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REFERENCE = Path("/root/reference")

torch = pytest.importorskip("torch")
if not REFERENCE.exists():  # pragma: no cover
    pytest.skip("reference checkout not available", allow_module_level=True)

sys.path.insert(0, str(REFERENCE))
try:
    from osu_fusion.modules import attention as ref_attention  # noqa: E402
    from osu_fusion.modules.unet import UNet as RefUNet  # noqa: E402
finally:
    # the reference root also holds top-level trainer.py/trainer_peft.py that
    # would shadow OUR entry points for every later-collected test; the
    # osu_fusion package is already bound in sys.modules, so submodule
    # imports inside the tests keep working without the path entry
    sys.path.remove(str(REFERENCE))

from osufusion_tpu.config import ModelConfig  # noqa: E402
from osufusion_tpu.nn.unet import UNet  # noqa: E402

# tiny 2-block denoiser, 64-dim (BASELINE config 2)
DIM_H = 96  # the reference's audio CrossEmbed needs dim_h > 72
MULT = (1, 2)
BLOCKS = (2, 2)
HEADS, DIM_HEAD, KV_HEADS = 2, 32, 1
CTX = 64
B, N = 2, 32


class _PlainSDPA(torch.nn.Module):
    """fp32 SDPA replacing the reference's CUDA-only Attend for CPU parity."""

    def forward(self, q, k, v, attn_mask=None):
        return torch.nn.functional.scaled_dot_product_attention(q, k, v, attn_mask=attn_mask)


@pytest.fixture(scope="module")
def models():
    torch.manual_seed(0)
    ref_attention.Attend.forward = lambda self, q, k, v, attn_mask=None: (
        torch.nn.functional.scaled_dot_product_attention(q, k, v, attn_mask=attn_mask)
    )
    ref = RefUNet(
        dim_in_x=6,
        dim_in_a=96,
        dim_in_c=5,
        dim_h=DIM_H,
        dim_h_mult=MULT,
        num_layer_blocks=BLOCKS,
        num_middle_transformers=1,
        attn_dim_head=DIM_HEAD,
        attn_heads=HEADS,
        attn_kv_heads=KV_HEADS,
        attn_context_len=CTX,
    ).eval()
    # the output conv is zero-init in both: randomize so outputs are nonzero
    with torch.no_grad():
        ref.final_conv.weight.normal_(0, 0.1)
        ref.final_conv.bias.normal_(0, 0.1)

    cfg = ModelConfig(
        dim_h=DIM_H,
        dim_h_mult=MULT,
        num_layer_blocks=BLOCKS,
        num_middle_transformers=1,
        attn_dim_head=DIM_HEAD,
        attn_heads=HEADS,
        attn_kv_heads=KV_HEADS,
        attn_context_len=CTX,
        dtype="float32",
        attn_backend="xla",
    )
    ours = UNet(cfg)
    params = ours.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, N, 6)),
        jnp.zeros((1, N, 96)),
        jnp.zeros((1,)),
        jnp.zeros((1, 5)),
        jnp.ones((1,), bool),
    )
    params = transplant(ref, params)
    return ref, ours, params


def transplant(ref, params):
    """Copy the torch weights into the flax tree via the PRODUCTION converter
    (utils/torch_convert.py, the engine behind convert_checkpoint.py) — the
    parity assertions below therefore validate the migration path too."""
    from osufusion_tpu.utils.torch_convert import convert_reference_state_dict

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    return jax.tree.map(jnp.asarray, convert_reference_state_dict(sd, params))


def make_inputs(seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-1, 1, (B, 6, N)).astype(np.float32)
    a = rng.normal(-5, 3, (B, 96, N)).astype(np.float32)
    t = np.array([17.0, 431.0], dtype=np.float32)
    c = rng.uniform(-1, 1, (B, 5)).astype(np.float32)
    return x, a, t, c


def test_forward_parity(models):
    ref, ours, params = models
    x, a, t, c = make_inputs()

    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(x), torch.from_numpy(a), torch.from_numpy(t), torch.from_numpy(c), cond_drop_prob=0.0
        ).numpy()

    # ours is channel-last
    our_out = np.asarray(
        ours.apply(
            params,
            jnp.asarray(x).swapaxes(1, 2),
            jnp.asarray(a).swapaxes(1, 2),
            jnp.asarray(t),
            jnp.asarray(c),
            jnp.ones((B,), bool),
        )
    ).swapaxes(1, 2)

    assert ref_out.shape == our_out.shape
    np.testing.assert_allclose(our_out, ref_out, rtol=2e-3, atol=2e-4)


def test_null_cond_parity(models):
    """cond_drop_prob=1.0 routes through the learned null embedding in both."""
    ref, ours, params = models
    x, a, t, c = make_inputs(1)
    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(x), torch.from_numpy(a), torch.from_numpy(t), torch.from_numpy(c), cond_drop_prob=1.0
        ).numpy()
    our_out = np.asarray(
        ours.apply(
            params,
            jnp.asarray(x).swapaxes(1, 2),
            jnp.asarray(a).swapaxes(1, 2),
            jnp.asarray(t),
            jnp.asarray(c),
            jnp.zeros((B,), bool),
        )
    ).swapaxes(1, 2)
    np.testing.assert_allclose(our_out, ref_out, rtol=2e-3, atol=2e-4)


def test_forward_parity_long_sequence(models):
    """T > attn_context_len — the regime the reference actually trains in
    (crop 4096 > per-level ctx at depth): exercises the RoPE
    length-interpolation (reference attention.py:42) and the global-attention
    path. Uses attn_local=False to mirror the reference's always-global SDPA;
    the local-window deviation at long T is pinned separately in
    tests/test_pallas_attention.py."""
    import dataclasses

    ref, ours, params = models
    ours_global = UNet(dataclasses.replace(ours.cfg, attn_local=False))

    N_long = 4 * CTX  # 256 > ctx 64: every UNet level runs beyond its context
    rng = np.random.default_rng(3)
    x = rng.uniform(-1, 1, (B, 6, N_long)).astype(np.float32)
    a = rng.normal(-5, 3, (B, 96, N_long)).astype(np.float32)
    t = np.array([17.0, 431.0], dtype=np.float32)
    c = rng.uniform(-1, 1, (B, 5)).astype(np.float32)

    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(x), torch.from_numpy(a), torch.from_numpy(t), torch.from_numpy(c), cond_drop_prob=0.0
        ).numpy()
    our_out = np.asarray(
        ours_global.apply(
            params,
            jnp.asarray(x).swapaxes(1, 2),
            jnp.asarray(a).swapaxes(1, 2),
            jnp.asarray(t),
            jnp.asarray(c),
            jnp.ones((B,), bool),
        )
    ).swapaxes(1, 2)
    assert ref_out.shape == our_out.shape
    np.testing.assert_allclose(our_out, ref_out, rtol=2e-3, atol=3e-4)


def test_input_gradient_parity(models):
    ref, ours, params = models
    x, a, t, c = make_inputs(2)

    xt = torch.from_numpy(x).requires_grad_(True)
    loss_t = (ref(xt, torch.from_numpy(a), torch.from_numpy(t), torch.from_numpy(c), cond_drop_prob=0.0) ** 2).mean()
    loss_t.backward()
    ref_grad = xt.grad.numpy()

    def loss_j(xj):
        out = ours.apply(
            params,
            xj.swapaxes(1, 2),
            jnp.asarray(a).swapaxes(1, 2),
            jnp.asarray(t),
            jnp.asarray(c),
            jnp.ones((B,), bool),
        )
        return (out.swapaxes(1, 2) ** 2).mean()

    l_j, our_grad = jax.value_and_grad(loss_j)(jnp.asarray(x))
    np.testing.assert_allclose(float(l_j), float(loss_t.detach()), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(our_grad), ref_grad, rtol=5e-3, atol=1e-4)


def test_checkpoint_converter_file_roundtrip(models, tmp_path):
    """The migration CLI's file path: a reference-style checkpoint on disk
    (wrapper `unet.` prefix, both .safetensors and .pt containers) loads and
    converts to exactly the tree the in-memory transplant produced."""
    from osufusion_tpu.utils.torch_convert import (
        convert_reference_state_dict,
        load_torch_checkpoint,
    )

    ref, _, params = models
    sd_t = {f"unet.{k}": v.detach().clone() for k, v in ref.state_dict().items()}

    from safetensors.torch import save_file

    st = tmp_path / "model.safetensors"
    save_file({k: v.contiguous() for k, v in sd_t.items()}, str(st))
    pt = tmp_path / "checkpoint.pt"
    torch.save({"model_state_dict": sd_t, "step": 123}, str(pt))

    for path in (st, pt):
        sd = load_torch_checkpoint(path)
        converted = convert_reference_state_dict(sd, params)
        mismatch = jax.tree.map(
            lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()), converted, params
        )
        assert max(jax.tree.leaves(mismatch)) == 0.0, path

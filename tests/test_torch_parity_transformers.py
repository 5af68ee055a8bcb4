"""Numeric parity vs the PyTorch reference for the transformer backbones.

Same harness shape as tests/test_torch_parity.py (which covers the UNet):
build the reference DiT (reference osu_fusion/modules/dit.py:162) and MMDiT
(reference osu_fusion/modules/mmdit.py:241) at a tiny config, transplant the
torch weights into the flax tree through the PRODUCTION converter
(utils/torch_convert.py), and pin forward output, null-cond (CFG) output, and
input gradients in fp32. This pins adaLN-Zero modulation order, QK-RMSNorm
placement, pooled-audio conditioning, joint-attention packing order and the
MMDiT patchify/unpatchify layout against the reference.

The reference's ``Attend`` hard-requires CUDA at forward time; patched to a
plain fp32 SDPA exactly as the UNet harness does. Skipped when torch or the
reference checkout is unavailable.
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
    from osu_fusion.modules.dit import DiT as RefDiT  # noqa: E402
    from osu_fusion.modules.mmdit import MMDiT as RefMMDiT  # noqa: E402
finally:
    sys.path.remove(str(REFERENCE))

from osufusion_tpu.config import ModelConfig  # noqa: E402
from osufusion_tpu.nn.dit import DiT  # noqa: E402
from osufusion_tpu.nn.mmdit import MMDiT  # noqa: E402
from osufusion_tpu.utils.torch_convert import convert_reference_state_dict  # noqa: E402

B, N = 2, 32


def _patch_attend():
    ref_attention.Attend.forward = lambda self, q, k, v, attn_mask=None: (
        torch.nn.functional.scaled_dot_product_attention(q, k, v, attn_mask=attn_mask)
    )


def make_inputs(seed=0, n=N):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-1, 1, (B, 6, n)).astype(np.float32)
    a = rng.normal(-5, 3, (B, 96, n)).astype(np.float32)
    t = np.array([17.0, 431.0], dtype=np.float32)
    c = rng.uniform(-1, 1, (B, 5)).astype(np.float32)
    return x, a, t, c


def transplant(ref, ours, example_n=N):
    params = ours.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, example_n, 6)),
        jnp.zeros((1, example_n, 96)),
        jnp.zeros((1,)),
        jnp.zeros((1, 5)),
        jnp.ones((1,), bool),
    )
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    return jax.tree.map(jnp.asarray, convert_reference_state_dict(sd, params))


# --------------------------------------------------------------------- DiT

# dim_h must exceed 76 (the CrossEmbed input-dim split quirk at 102 input
# channels) and equal heads * dim_head (no output projection in DiTAttention)
DIT_DIM, DIT_HEADS, DIT_DIM_HEAD, DIT_DEPTH = 96, 3, 32, 2


@pytest.fixture(scope="module")
def dit_models():
    torch.manual_seed(0)
    _patch_attend()
    ref = RefDiT(
        dim_in_x=6,
        dim_in_a=96,
        dim_in_c=5,
        dim_h=DIT_DIM,
        depth=DIT_DEPTH,
        attn_heads=DIT_HEADS,
        attn_dim_head=DIT_DIM_HEAD,
        attn_context_len=64,
    ).eval()
    with torch.no_grad():  # zero-init outputs would hide mapping bugs
        ref.postprocess.weight.normal_(0, 0.1)
        for blk in ref.blocks:
            blk.modulation[1].weight.normal_(0, 0.1)
            blk.modulation[1].bias.normal_(0, 0.1)
        ref.final.modulation[1].weight.normal_(0, 0.1)
        ref.final.modulation[1].bias.normal_(0, 0.1)

    cfg = ModelConfig(
        backbone="dit",
        dim_h=DIT_DIM,
        depth=DIT_DEPTH,
        attn_heads=DIT_HEADS,
        attn_dim_head=DIT_DIM_HEAD,
        attn_context_len=64,
        dtype="float32",
        attn_backend="xla",
    )
    ours = DiT(cfg)
    params = transplant(ref, ours)
    return ref, ours, params


def _ref_out(ref, x, a, t, c, drop=0.0):
    with torch.no_grad():
        return ref(
            torch.from_numpy(x), torch.from_numpy(a), torch.from_numpy(t), torch.from_numpy(c),
            cond_drop_prob=drop,
        ).numpy()


def _our_out(ours, params, x, a, t, c, cond=True):
    return np.asarray(
        ours.apply(
            params,
            jnp.asarray(x).swapaxes(1, 2),
            jnp.asarray(a).swapaxes(1, 2),
            jnp.asarray(t),
            jnp.asarray(c),
            jnp.full((x.shape[0],), cond, bool),
        )
    ).swapaxes(1, 2)


def test_dit_forward_parity(dit_models):
    ref, ours, params = dit_models
    x, a, t, c = make_inputs()
    ref_out = _ref_out(ref, x, a, t, c)
    our_out = _our_out(ours, params, x, a, t, c)
    assert ref_out.shape == our_out.shape
    np.testing.assert_allclose(our_out, ref_out, rtol=2e-3, atol=2e-4)


def test_dit_null_cond_parity(dit_models):
    ref, ours, params = dit_models
    x, a, t, c = make_inputs(1)
    ref_out = _ref_out(ref, x, a, t, c, drop=1.0)
    our_out = _our_out(ours, params, x, a, t, c, cond=False)
    np.testing.assert_allclose(our_out, ref_out, rtol=2e-3, atol=2e-4)


def test_dit_input_gradient_parity(dit_models):
    ref, ours, params = dit_models
    x, a, t, c = make_inputs(2)

    xt = torch.from_numpy(x).requires_grad_(True)
    loss_t = (
        ref(xt, torch.from_numpy(a), torch.from_numpy(t), torch.from_numpy(c), cond_drop_prob=0.0) ** 2
    ).mean()
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


# ------------------------------------------------------------------- MMDiT

MM_DIM, MM_HEADS, MM_DIM_HEAD, MM_KV, MM_PATCH, MM_DEPTH = 64, 2, 32, 2, 4, 2


@pytest.fixture(scope="module")
def mmdit_models():
    torch.manual_seed(1)
    _patch_attend()
    ref = RefMMDiT(
        dim_in_x=6,
        dim_in_a=96,
        dim_in_c=5,
        dim_h=MM_DIM,
        patch_size=MM_PATCH,
        depth=MM_DEPTH,
        attn_heads=MM_HEADS,
        attn_dim_head=MM_DIM_HEAD,
        attn_kv_heads=MM_KV,
        attn_context_len=64,
    ).eval()
    with torch.no_grad():  # randomize the zero-inits so outputs are nonzero
        ref.out.weight.normal_(0, 0.1)
        ref.out.bias.normal_(0, 0.1)
        ref.final_layer.linear.weight.normal_(0, 0.1)
        ref.final_layer.linear.bias.normal_(0, 0.1)
        for blk in ref.blocks:
            blk.modulation_x[1].weight.normal_(0, 0.1)
            blk.modulation_x[1].bias.normal_(0, 0.1)
            blk.modulation_a[1].weight.normal_(0, 0.1)
            blk.modulation_a[1].bias.normal_(0, 0.1)

    cfg = ModelConfig(
        backbone="mmdit",
        dim_h=MM_DIM,
        depth=MM_DEPTH,
        patch_size=MM_PATCH,
        attn_heads=MM_HEADS,
        attn_dim_head=MM_DIM_HEAD,
        attn_kv_heads=MM_KV,
        attn_context_len=64,
        dtype="float32",
        attn_backend="xla",
    )
    ours = MMDiT(cfg)
    params = transplant(ref, ours)
    return ref, ours, params


def test_mmdit_forward_parity(mmdit_models):
    ref, ours, params = mmdit_models
    x, a, t, c = make_inputs(3)
    ref_out = _ref_out(ref, x, a, t, c)
    our_out = _our_out(ours, params, x, a, t, c)
    assert ref_out.shape == our_out.shape
    np.testing.assert_allclose(our_out, ref_out, rtol=2e-3, atol=2e-4)


def test_mmdit_forward_parity_unaligned_length(mmdit_models):
    """N not divisible by patch_size: both sides pad x with -1 / a with -23
    to the patch multiple and crop back (reference mmdit.py:364-365)."""
    ref, ours, params = mmdit_models
    n = N - 1
    assert n % MM_PATCH != 0
    x, a, t, c = make_inputs(4, n=n)
    ref_out = _ref_out(ref, x, a, t, c)
    our_out = _our_out(ours, params, x, a, t, c)
    assert ref_out.shape == our_out.shape == (B, 6, n)
    np.testing.assert_allclose(our_out, ref_out, rtol=2e-3, atol=2e-4)


def test_mmdit_null_cond_parity(mmdit_models):
    ref, ours, params = mmdit_models
    x, a, t, c = make_inputs(5)
    ref_out = _ref_out(ref, x, a, t, c, drop=1.0)
    our_out = _our_out(ours, params, x, a, t, c, cond=False)
    np.testing.assert_allclose(our_out, ref_out, rtol=2e-3, atol=2e-4)


def test_mmdit_input_gradient_parity(mmdit_models):
    ref, ours, params = mmdit_models
    x, a, t, c = make_inputs(6)

    xt = torch.from_numpy(x).requires_grad_(True)
    loss_t = (
        ref(xt, torch.from_numpy(a), torch.from_numpy(t), torch.from_numpy(c), cond_drop_prob=0.0) ** 2
    ).mean()
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

"""Analytic FLOP counting for the denoiser backbones (UNet, DiT, MMDiT).

XLA's ``cost_analysis`` excludes custom-call (Pallas) FLOPs, so MFU computed
from it under-reports. This walks the architecture and counts matmul/conv
MACs x2; attention counts the actual visited-KV span of the windowed kernel.
"""

from __future__ import annotations

from osufusion_tpu.config import ModelConfig
from osufusion_tpu.ops.pallas_attention import _choose_blocks, _span_visits


def _conv(B: int, T: int, cin: int, cout: int, k: int) -> float:
    return 2.0 * B * T * cin * cout * k


def _dense(B: int, T: int, din: int, dout: int) -> float:
    return 2.0 * B * T * din * dout


def _attention(B: int, T: int, heads: int, dh: int, kv_heads: int, window: int | None) -> float:
    group = heads // kv_heads
    bq, bk, _ = _choose_blocks(T, T, group)
    if window is not None and T <= window:
        window = None  # same no-op rule as the kernel dispatch
    if window is None:
        visited = T
    else:
        visited = min(T, _span_visits(window, bq, bk, T // bk) * bk)
    return 4.0 * B * heads * T * visited * dh


def _attn_module(B: int, T: int, dim: int, cfg: ModelConfig, ctx: int) -> float:
    """The un-rematted part of a transformer under "save-attn": q/kv/out
    projections + the flash kernel (everything inside nn.blocks.Attention)."""
    inner = cfg.attn_heads * cfg.attn_dim_head
    kv_inner = cfg.attn_kv_heads * cfg.attn_dim_head
    f = _dense(B, T, dim, inner)  # to_q
    f += _dense(B, T, dim, kv_inner * 2)  # to_kv
    f += _attention(B, T, cfg.attn_heads, cfg.attn_dim_head, cfg.attn_kv_heads, ctx if cfg.attn_local else None)
    f += _dense(B, T, inner, dim)  # to_out
    return f


def _transformer(B: int, T: int, dim: int, cfg: ModelConfig, ctx: int) -> float:
    f = _attn_module(B, T, dim, cfg, ctx)
    f += _dense(B, T, dim, dim * 2) + _dense(B, T, dim * 2, dim)  # ff mult 2
    return f


def _resblock(B: int, T: int, cin: int, cout: int) -> float:
    f = _conv(B, T, cin, cout, 3) + _conv(B, T, cout, cout, 3)
    f += _dense(B, 1, cout, cout // 2) * 2  # GCA bottleneck (approx)
    if cin != cout:
        f += _conv(B, T, cin, cout, 1)
    return f


def unet_fwd_flops(cfg: ModelConfig, batch: int, seq: int) -> float:
    """Forward FLOPs of one UNet call (trunk + audio encoder)."""
    B, T = batch, seq
    h = cfg.dim_h
    dims = [h] + [h * m for m in cfg.dim_h_mult]
    total = 0.0

    # stems (approximate: full dim over the 3 kernels)
    total += _conv(B, T, cfg.dim_in_x, h, 8) + _conv(B, T, cfg.dim_in_a, h, 8)

    def stack(with_cond: bool, audio_ctx: bool) -> float:
        f = 0.0
        t = T
        for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
            ctx = (4096 if audio_ctx else cfg.attn_context_len) // (2**i)
            n_blocks = cfg.num_layer_blocks[i]
            f += _resblock(B, t, din, din)  # init
            for _ in range(n_blocks):
                f += _resblock(B, t, din, din)
                f += _transformer(B, t, din, cfg, ctx)
            if with_cond:
                f += _dense(B, 1, h * 8, din * 2) * (n_blocks + 1)  # FiLM mlps
            f += _conv(B, t, din, dout, 3)  # sampler
            if i < len(dims) - 2:
                t //= 2
        return f

    total += stack(True, False)  # down path
    total += stack(False, True)  # audio encoder
    tb = T // (2 ** (len(dims) - 2))
    bottleneck_ctx = cfg.attn_context_len // (2 ** (len(dims) - 2))
    total += _resblock(B, tb, dims[-1] * 2, dims[-1])
    total += cfg.num_middle_transformers * _transformer(B, tb, dims[-1], cfg, bottleneck_ctx)
    total += _resblock(B, tb, dims[-1], dims[-1])

    # up path (mirror of down with skip concats)
    t = tb
    for i, (dout, din) in enumerate(reversed(list(zip(dims[:-1], dims[1:])))):
        ctx = cfg.attn_context_len // (2 ** (len(dims) - 2 - i))
        n_blocks = tuple(reversed(cfg.num_layer_blocks))[i]
        f_in = din + (dims[::-1][i + 1] if i + 1 < len(dims) else h)
        total += _resblock(B, t, f_in, din)
        for _ in range(n_blocks):
            total += _resblock(B, t, din, din)
            total += _transformer(B, t, din, cfg, ctx)
        total += _conv(B, t, din, dout, 3)
        if i < len(dims) - 2:
            t *= 2

    total += _resblock(B, T, h * 2, h) + _conv(B, T, h, cfg.dim_in_x, 1)
    return total


def _unet_level_modes(cfg: ModelConfig, remat_mode: str) -> list[str]:
    """Per-width-level effective remat mode (mirrors nn.unet.level_remat_mode)."""
    n = len(cfg.dim_h_mult)
    if remat_mode != "mixed":
        return [remat_mode] * n
    modes = cfg.remat_level_modes or ("save-attn",)
    return [modes[min(i, len(modes) - 1)] for i in range(n)]


def unet_remat_recompute_flops(
    cfg: ModelConfig, batch: int, seq: int, remat_mode: str = "save-attn"
) -> float:
    """Forward FLOPs actually re-executed in the backward under the given
    remat mode. "block": the whole UNetBlock (resnets, transformers incl.
    attention, sampler, FiLM mlps) re-runs. "save-attn": every ResidualBlock
    inside a UNetBlock plus every transformer FeedForward (incl. the middle
    transformers); attention modules, samplers, stems, middle resnets and
    the final head are NOT rematerialized. "ff": the FeedForwards only.
    "resnet": the ResidualBlocks only. "resnet-dots": the resblocks remat
    but their conv (dot) outputs are SAVED by policy, so the re-executed
    work is elementwise only — zero matmul FLOPs. "mixed": per-width-level
    modes from cfg.remat_level_modes (the full-song policy)."""
    B, T = batch, seq
    h = cfg.dim_h
    dims = [h] + [h * m for m in cfg.dim_h_mult]
    modes = _unet_level_modes(cfg, remat_mode)
    # the AudioEncoder stack may be overridden wholesale (config.py
    # audio_remat_mode) — mirror nn.unet.level_remat_mode(audio=True)
    audio_modes = (
        [cfg.audio_remat_mode] * len(modes)
        if getattr(cfg, "audio_remat_mode", None) and cfg.remat
        else modes
    )
    total = 0.0

    def ff(t: int, dim: int) -> float:
        return _dense(B, t, dim, dim * 2) + _dense(B, t, dim * 2, dim)

    def level(mode: str, t: int, din: int, dout: int, ctx: int, n_blocks: int,
              first_in: int) -> float:
        """Recompute of ONE UNetBlock (working dim ``din``, sampler to
        ``dout``, concat-widened first resnet ``first_in``) under ``mode``."""
        if mode in ("none", "resnet-dots"):
            return 0.0
        if mode in ("block", "save-attn-out"):
            f = _resblock(B, t, first_in, din) + _resblock(B, t, din, din) * n_blocks
            f += _transformer(B, t, din, cfg, ctx) * n_blocks
            f += _conv(B, t, din, dout, 3)  # sampler
            if mode == "save-attn-out":
                # the policy saves the flash kernel's outputs: the backward
                # re-runs projections/FFs/resnets but never the kernel
                f -= n_blocks * _attention(
                    B, t, cfg.attn_heads, cfg.attn_dim_head, cfg.attn_kv_heads,
                    ctx if cfg.attn_local else None,
                )
            return f
        f = 0.0
        if mode in ("save-attn", "inner", "resnet"):
            f += _resblock(B, t, first_in, din) + _resblock(B, t, din, din) * n_blocks
        if mode in ("save-attn", "inner", "ff"):
            f += ff(t, din) * n_blocks
        return f

    for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
        t = T // (2**i)
        n_blocks = cfg.num_layer_blocks[i]
        ctx = cfg.attn_context_len // (2**i)
        # down + audio encoder (same topology, audio ctx base 4096) + the up
        # block of the same width (working dim dims[i+1], widened first
        # resnet from the skip concat)
        total += level(modes[i], t, din, dout, ctx, n_blocks, din)
        total += level(audio_modes[i], t, din, dout, 4096 // (2**i), n_blocks, din)
        total += level(modes[i], t, dout, din, ctx, n_blocks, dout + din)

    tb = T // (2 ** (len(dims) - 2))
    if modes[-1] in ("save-attn", "inner", "ff"):
        total += cfg.num_middle_transformers * ff(tb, dims[-1])
    return total


# ------------------------------------------------- transformer backbones


def _cross_embed_flops(B: int, T: int, dim_in: int, dim_out: int, kernels=(3, 7, 15)) -> float:
    """Exact CrossEmbed stem cost with the reference's input-dim channel split
    (nn/blocks.py CrossEmbedLayer)."""
    ks = sorted(kernels)
    scales = [dim_in // (2**i) for i in range(1, len(ks))]
    scales = [*scales, dim_out - sum(scales)]
    if scales[-1] <= 0:  # small-model fallback split (output-dim halving)
        scales = [dim_out // (2**i) for i in range(1, len(ks))]
        scales = [*scales, dim_out - sum(scales)]
    return sum(_conv(B, T, dim_in, s, k) for s, k in zip(scales, ks))


def dit_fwd_flops(cfg: ModelConfig, batch: int, seq: int) -> float:
    """Forward FLOPs of one DiT call (nn/dit.py; reference dit.py:162)."""
    B, T, h = batch, seq, cfg.dim_h
    total = _cross_embed_flops(B, T, cfg.dim_in_x + cfg.dim_in_a, h, cfg.cross_embed_kernel_sizes)
    # conditioning mlps (B x 1 rows — negligible but counted)
    total += _dense(B, 1, cfg.dim_in_a * 2, h) + 2 * _dense(B, 1, h, h)  # audio pool + mlp
    total += 2 * _dense(B, 1, h, h)  # time mlp
    total += _dense(B, 1, cfg.dim_in_c, h) + _dense(B, 1, h, h)  # cond mlp
    per_block = (
        _dense(B, 1, h, h * 6)  # adaLN modulation
        + _dense(B, T, h, h * 3)  # to_qkv
        + 4.0 * B * cfg.attn_heads * T * T * cfg.attn_dim_head  # global MHA
        + _dense(B, T, h, h * 4)
        + _dense(B, T, h * 4, h)  # ff mult 4
    )
    total += cfg.depth * per_block
    total += _dense(B, 1, h, h * 2) + _dense(B, T, h, h)  # final adaLN + linear
    total += _dense(B, T, h, cfg.dim_in_x)  # postprocess
    return total


def mmdit_fwd_flops(cfg: ModelConfig, batch: int, seq: int) -> float:
    """Forward FLOPs of one MMDiT call (nn/mmdit.py; reference mmdit.py:241)."""
    B, T, h, p = batch, seq, cfg.dim_h, cfg.patch_size
    Tp = -(-T // p)  # tokens per stream
    S = 2 * Tp  # packed joint sequence
    kv = max(cfg.attn_kv_heads, 2)
    total = _conv(B, Tp, cfg.dim_in_x, h, p) + _conv(B, Tp, cfg.dim_in_a, h, p)  # patch embeds
    total += _dense(B, 1, cfg.dim_in_a * 2, h) + 2 * _dense(B, 1, h, h * 4)  # audio pool + FF
    total += 2 * _dense(B, 1, h, h * 4)  # time FF (approx: 4h inner both legs)
    total += _dense(B, 1, cfg.dim_in_c, h) + 2 * _dense(B, 1, h, h * 4)  # cond in + FF
    q_dim = cfg.attn_heads * cfg.attn_dim_head
    kv_dim = kv * cfg.attn_dim_head
    per_block = (
        2 * _dense(B, 1, h, h * 6)  # modulation_x + modulation_a
        + 2 * (_dense(B, Tp, h, q_dim) + 2 * _dense(B, Tp, h, kv_dim))  # q/k/v both streams
        + 4.0 * B * cfg.attn_heads * S * S * cfg.attn_dim_head  # joint global attention
        + 2 * _dense(B, Tp, q_dim, h)  # attn_out_x / attn_out_a
        + 2 * (_dense(B, Tp, h, h * 4) + _dense(B, Tp, h * 4, h))  # mlp_x / mlp_a
    )
    total += cfg.depth * per_block
    total += _dense(B, 1, h, h * 2) + _dense(B, Tp, h, p * h)  # final adaLN + linear
    total += _dense(B, T, h, cfg.dim_in_x)  # out
    return total


def model_fwd_flops(cfg: ModelConfig, batch: int, seq: int) -> float:
    """Forward FLOPs of one denoiser call, dispatched on the backbone."""
    if cfg.backbone == "dit":
        return dit_fwd_flops(cfg, batch, seq)
    if cfg.backbone == "mmdit":
        return mmdit_fwd_flops(cfg, batch, seq)
    return unet_fwd_flops(cfg, batch, seq)


def train_step_flops(
    cfg: ModelConfig, batch: int, seq: int, remat: bool = True, remat_mode: str = "save-attn"
) -> float:
    """Executed FLOPs of one train step: fwd + bwd (2x fwd) + the remat
    recompute the configured mode actually performs."""
    fwd = model_fwd_flops(cfg, batch, seq)
    if not remat:
        return fwd * 3.0
    if cfg.backbone in ("dit", "mmdit"):
        # transformer remat is whole-block (nn.remat around DiTBlock/MMDiTBlock):
        # the backward re-runs every block forward; stems/heads are not rematted
        return fwd * 4.0
    if remat_mode == "block" and not getattr(cfg, "audio_remat_mode", None):
        return fwd * 4.0
    # "mixed" and the partial modes share the exact per-level accounting
    return fwd * 3.0 + unet_remat_recompute_flops(cfg, batch, seq, remat_mode)

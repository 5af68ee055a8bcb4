"""Single dataclass config system consumed by every entry point.

The reference scatters hyperparameters between constructor defaults and CLI
flags, with two flags parsed but never wired (--model-attn-heads,
--model-depth, reference trainer.py:380-381) and a hardcoded dim_h=128 at
inference (inference_gradio.py:40). Here every knob lives in one place and all
CLIs and the serving path honor it (SURVEY.md section 5.6).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Optional, Tuple

import jax.numpy as jnp

from osufusion_tpu.audio.constants import AUDIO_DIM, CONTEXT_DIM

TOTAL_DIM = 6  # osufusion_tpu.codec.encode.TOTAL_DIM (kept literal to avoid a cycle)

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "float16": jnp.float16}


@dataclass(frozen=True)
class ModelConfig:
    """Denoiser backbone configuration (UNet defaults match reference
    osu_fusion/modules/unet.py:321-335 / models/diffusion.py:16-29)."""

    backbone: str = "unet"  # unet | dit | mmdit
    dim_in_x: int = TOTAL_DIM
    dim_in_a: int = AUDIO_DIM
    dim_in_c: int = CONTEXT_DIM
    dim_h: int = 512
    dim_h_mult: Tuple[int, ...] = (1, 2, 3, 4)
    num_layer_blocks: Tuple[int, ...] = (3, 3, 3, 3)
    num_middle_transformers: int = 3
    cross_embed_kernel_sizes: Tuple[int, ...] = (3, 7, 15)
    attn_dim_head: int = 64
    attn_heads: int = 16
    attn_kv_heads: int = 1
    attn_context_len: int = 4096
    # DiT / MMDiT specific
    depth: int = 12
    patch_size: int = 4
    # numerics
    dtype: str = "bfloat16"
    param_dtype: str = "float32"
    # "fp8": big Dense dots run on dynamically-scaled float8_e4m3 operands
    # with straight-through bf16 backward (ops/quant.py) — the TPU analog of
    # the reference's MS-AMP O1 --mixed-precision fp8 (ref trainer.py:210)
    quant: str = "none"
    remat: bool = False
    # remat granularity (only read when remat=True):
    #   "block"     — whole UNetBlocks under jax.checkpoint: smallest memory,
    #                 but the backward re-runs every flash-attention forward.
    #   "save-attn" — remat the ResidualBlocks and transformer FFs only; the
    #                 attention module stays un-rematted so its custom-VJP
    #                 residuals (q/k/v/out/lse) are SAVED. Costs ~2 GB of
    #                 activations at the production config but removes one
    #                 full flash-fwd pass per site from the backward (~13% of
    #                 the step on a v5e).
    #   "ff"        — remat only the transformer FeedForwards: ~1T recompute
    #                 (vs save-attn's ~4.9T at the production config) for a
    #                 few GB of freed hidden states.
    #   "resnet"    — remat only the ResidualBlocks. Their recompute is
    #                 elementwise/conv chains that stay inside fused XLA
    #                 kernels, so this mode REMOVES the save/reload HBM
    #                 round-trips of the GroupNorm/FiLM/SiLU soup: smaller
    #                 AND faster than saving everything (measured fastest
    #                 train-step mode on v5e at the production config).
    #   "resnet-dots" — like "resnet" but with jax.checkpoint's dots_saveable
    #                 policy: the resblock CONV outputs are saved while the
    #                 GroupNorm/FiLM/SiLU elementwise chains still recompute —
    #                 trades ~2 conv-output tensors of HBM per block for
    #                 skipping the conv recompute FLOPs in the backward.
    #   "save-attn-out" — whole-block remat under a save_only_these_names
    #                 policy pinning the flash kernel's OUTPUTS (o, lse):
    #                 backward re-runs the cheap projections but never the
    #                 attention kernel, at ~half save-attn's saved bytes.
    #   "mixed"     — PER-LEVEL modes from ``remat_level_modes``: entry i
    #                 applies to width level i (down_i, audio_i and the
    #                 up level of the same width; the middle follows the
    #                 narrowest level). The full-song (T=65536) regime needs
    #                 this: "block" everywhere fits 15.75 GB but re-runs
    #                 every flash forward (~25% of executed FLOPs), while
    #                 every single-mode alternative OOMs — saving just the
    #                 widest level's attention residuals buys back the
    #                 single largest recompute item (the level-0 windowed
    #                 attention) for a few GB.
    remat_mode: str = "save-attn"
    # per-width-level remat modes, read only when remat_mode == "mixed";
    # missing entries repeat the last one. Default = the measured full-song
    # frontier winner: save-attn-out at the two widest levels (1.947 s/step,
    # 34.98% MFU at T=65536 on one v5e), block below. Extending save-attn-out
    # to level 2 overshoots the 15.75 GB HBM by 86 MB, uniform save-attn-out
    # by 501 MB, and plain save-attn at level 0 alone by 814 MB (all
    # measured — bench_results/r05_fullsong_*.json).
    remat_level_modes: Tuple[str, ...] = ("save-attn-out", "save-attn-out", "block", "block")
    # remat mode override for the parallel AudioEncoder stack; None follows
    # the trunk's per-level plan (the historical behavior). The audio stack's
    # saved flash o+lse at T=65536 cost hundreds of MB while re-running its
    # windowed attention forwards is only ~1-2% of the step, so "block" here
    # frees the HBM that lets the TRUNK keep save-attn-out at one more width
    # level (the shared-plan mixed012 run OOM'd by just 86 MB — measured,
    # bench_results/r05_fullsong_mixed012_oom.json).
    audio_remat_mode: Optional[str] = None
    # attention backend: "xla" | "pallas" (pallas falls back to xla off-TPU)
    attn_backend: str = "auto"
    # sliding-window local attention with window = the level's context length.
    # DELIBERATE deviation from the reference, scoped to long sequences only:
    # the window engages ONLY when T > attn_context_len (nn/blocks.py), so
    # training crops up to the context length run global attention —
    # bit-identical to the reference's SDPA (reference attention.py:94) —
    # while full-song sampling bounds each query to a +/- window/2 field (the
    # same receptive width training saw) and drops FLOPs from O(T^2) to
    # O(T*window) (SURVEY.md sec 5.7). tests/test_pallas_attention.py pins
    # both sides of the T == context_len boundary.
    attn_local: bool = True

    @property
    def compute_dtype(self):
        return _DTYPES[self.dtype]

    @property
    def params_dtype(self):
        return _DTYPES[self.param_dtype]

    @property
    def unet_depth(self) -> int:
        return len(self.dim_h_mult)


@dataclass(frozen=True)
class DiffusionConfig:
    """Objective + sampler configuration (reference models/diffusion.py:48-54,
    rectified_flow.py:51-52)."""

    objective: str = "diffusion"  # diffusion (DDIM) | rectified-flow
    train_timesteps: int = 1000
    sampling_timesteps: int = 35  # DDIM steps; rectified flow default is 16
    cond_drop_prob: float = 0.5
    cfg_scale: float = 7.0  # diffusion default; RF default is 2.0
    beta_start: float = 0.0001
    beta_end: float = 0.02
    clip_sample: bool = True


@dataclass(frozen=True)
class TrainConfig:
    """Training loop configuration (CLI-flag parity with reference
    trainer.py:364-391)."""

    project_dir: str = "runs/default"
    dataset_dir: str = "data"
    model_type: str = "diffusion"
    resume: Optional[str] = None
    reset_steps: bool = False
    dataset_mode: str = "subsequence"  # subsequence | random-length | full-sequence | dummy
    max_length: int = 0
    segment_length: int = 4096
    # re-rate each crop's star-rating conditioning (reference default ON,
    # osu_fusion/library/dataset.py:75); off for dummy data
    segment_sr: bool = True
    # fraction of maps visited per epoch (reference dataset.py:75 sample_density)
    sample_density: float = 1.0
    mixed_precision: str = "bf16"  # no | fp16 | bf16 (reference also has fp8 via MS-AMP)
    full_bf16: bool = False
    # Adam moment storage: "dtype" keeps optax.adamw's default (moments in
    # the params' dtype — bf16 under full_bf16); "int8" stores both moments
    # blockwise-absmax-quantized (train/quant_opt.py), ~2.5 GB freed at the
    # 1.28B-param production width — the HBM that decides which remat policy
    # fits the T=65536 full-song regime.
    opt_moments: str = "dtype"
    gradient_checkpointing: bool = False
    gradient_accumulation_steps: int = 1
    clip_grad_norm: float = 0.0
    lr: float = 1e-5
    batch_size: int = 4
    num_workers: int = 2
    total_steps: int = 1_000_000
    save_every: int = 1000
    max_num_checkpoints: int = 5
    warmup_steps: int = 1000
    sample_every: int = 1000
    sample_audio: Optional[str] = None
    seed: int = 0
    # parallelism: data x seq x model axes; -1 = all available devices on
    # data. seq > 1 shards the FRAME axis (sequence parallelism) for
    # full-song training: windowed attention runs halo-exchange kernels
    # (parallel/sequence.py), everything else is GSPMD-partitioned.
    mesh_data: int = -1
    mesh_model: int = 1
    mesh_seq: int = 1
    # ZeRO-1: shard optimizer moments over the data axis (no effect at data=1)
    shard_opt_state: bool = True


@dataclass(frozen=True)
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    diffusion: DiffusionConfig = field(default_factory=DiffusionConfig)
    train: TrainConfig = field(default_factory=TrainConfig)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @staticmethod
    def from_json(text: str) -> "Config":
        raw = json.loads(text)

        def mk(cls, d):
            fields = {f.name for f in dataclasses.fields(cls)}
            kwargs = {k: (tuple(v) if isinstance(v, list) else v) for k, v in d.items() if k in fields}
            return cls(**kwargs)

        return Config(
            model=mk(ModelConfig, raw.get("model", {})),
            diffusion=mk(DiffusionConfig, raw.get("diffusion", {})),
            train=mk(TrainConfig, raw.get("train", {})),
        )

    def save(self, path: Path) -> None:
        Path(path).write_text(self.to_json())

    @staticmethod
    def load(path: Path) -> "Config":
        return Config.from_json(Path(path).read_text())

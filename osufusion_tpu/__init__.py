"""OsuFusion-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework for training and
serving conditional 1-D diffusion models that generate osu! beatmaps from audio.

Re-designed from scratch for TPU hardware with the capability surface of the
reference PyTorch codebase (fauzanardh/OsuFusion):

- ``osufusion_tpu.osu``      — osu! domain model (parse/serialize .osu, sliders, replays)
- ``osufusion_tpu.codec``    — beatmap <-> 6xT signal codec (vectorized numpy)
- ``osufusion_tpu.audio``    — audio decode + log-VQT front end (jitted MXU matmul filterbank)
- ``osufusion_tpu.nn``       — flax denoiser backbones (UNet / DiT / MMDiT), channel-last
- ``osufusion_tpu.models``   — diffusion (DDIM) and rectified-flow wrappers + scan samplers
- ``osufusion_tpu.parallel`` — device mesh + GSPMD sharding rules (dp/tp over ICI)
- ``osufusion_tpu.train``    — pjit training loop, orbax checkpoints, data pipeline
- ``osufusion_tpu.peft``     — LoRA/DoRA parameter-overlay fine-tuning
- ``osufusion_tpu.serve``    — end-to-end generation (audio -> .osz)
- ``osufusion_tpu.ops``      — Pallas TPU kernels (fused attention) + XLA fallbacks
"""

__version__ = "0.1.0"

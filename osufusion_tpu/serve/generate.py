"""End-to-end generation: audio file -> sampled signal -> .osu decode -> .osz.

Capability parity with reference inference_gradio.py's ``generate_beatmap``
(:87-165) and ``load_model``/``create_model_from_checkpoint`` (:28-42), minus
its hardcoded dim_h=128 (the model config travels with the checkpoint here).
The sampler runs as one compiled program per (batch, padded-length) shape with
the audio encoded once (see models/diffusion.py).
"""

from __future__ import annotations

import io
import zipfile
from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from osufusion_tpu.audio import frame_times, load_audio, normalize_context
from osufusion_tpu.codec.decode import Metadata, decode_beatmap
from osufusion_tpu.config import Config, ModelConfig
from osufusion_tpu.models import build_model
from osufusion_tpu.utils.serialization import load_safetensors

# pad generated lengths to a multiple of this so the flash-attention kernel
# tiles every UNet level (128 at the deepest of 4 levels) and XLA sees few
# distinct shapes
LENGTH_BUCKET = 8192


def load_model(model_path: Path, config_path: Optional[Path] = None):
    """Returns (model, params). Config comes from the sibling config.json if
    present (written by trainer.py), else defaults."""
    model_path = Path(model_path)
    if config_path is None:
        candidate = model_path.parent / "config.json"
        config_path = candidate if candidate.exists() else None
    cfg = Config.load(config_path) if config_path else Config(model=ModelConfig(dim_h=128))
    model = build_model(cfg.model, cfg.diffusion)
    params_like = model.init_params(jax.random.PRNGKey(0))
    from osufusion_tpu.utils.serialization import load_params_lenient

    params = load_params_lenient(params_like, load_safetensors(model_path))
    return model, params


def generate_beatmap(
    model,
    params,
    audio_path: Path,
    title: str = "Unknown",
    artist: str = "Unknown",
    version: str = "OsuFusion",
    cs: float = 4.0,
    ar: float = 9.0,
    od: float = 9.0,
    hp: float = 5.0,
    sr: float = 6.0,
    num_samples: int = 1,
    sampling_timesteps: Optional[int] = None,
    sampler: Optional[str] = None,  # None = model default; "dpmpp-2m" halves diffusion steps
    cond_scale: float = 2.0,
    bpm: Optional[float] = None,
    allow_beat_snap: bool = True,
    seed: int = 0,
    output_path: Optional[Path] = None,
    use_aot: Optional[bool] = None,
) -> Tuple[bytes, list[str]]:
    """Returns (.osz bytes, list of .osu texts). Writes to output_path if given.

    ``use_aot`` (default: the OSUFUSION_AOT env flag) serves the sampler from
    an AOT-serialized executable (serve/aot.py): the first process per
    (config, shape, steps, sampler) pays the trace+export, every later
    process skips Python tracing entirely — the dominant serving cold-start
    cost on slow hosts."""
    import os

    if use_aot is None:
        use_aot = os.environ.get("OSUFUSION_AOT", "0") == "1"
    audio_path = Path(audio_path)
    spec = load_audio(audio_path)  # (96, T)
    n = spec.shape[-1]
    padded = ((n + LENGTH_BUCKET - 1) // LENGTH_BUCKET) * LENGTH_BUCKET
    spec_p = np.pad(spec, ((0, 0), (0, padded - n)), constant_values=-23.0)

    a = jnp.asarray(np.repeat(spec_p[None], num_samples, axis=0))
    c = jnp.asarray(np.repeat(normalize_context(np.array([cs, ar, od, hp, sr], np.float32))[None], num_samples, 0))
    x0 = jax.random.normal(jax.random.PRNGKey(seed), (num_samples, model.model_cfg.dim_in_x, padded))

    if use_aot:
        from osufusion_tpu.serve.aot import load_or_export_sampler

        from osufusion_tpu.models import DiffusionModel as _DM

        steps = sampling_timesteps or model.cfg.sampling_timesteps
        method = sampler or ("ddim" if isinstance(model, _DM) else "midpoint")
        run = load_or_export_sampler(model, params, a.shape, steps, method, cond_scale)
        # drain the param upload before the first execute: on a remote-device
        # link the deserialized executable's first call otherwise absorbs the
        # pending transfers synchronously (measured on the tunneled v5e)
        params = jax.block_until_ready(jax.device_put(params, jax.devices()[0]))
        out = run(params, a, c, x0)
    else:
        kw = {} if sampler is None else {"method": sampler}
        out = model.sample(params, a, c, x=x0, cond_scale=cond_scale, sampling_timesteps=sampling_timesteps, **kw)
    signals = np.asarray(out)[..., :n]  # crop padding back off

    ft = frame_times(n)
    meta = Metadata(audio_path.name, title, artist, version, cs, ar, od, hp)

    osu_texts = []
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.write(audio_path, audio_path.name)
        for i in range(num_samples):
            osu = decode_beatmap(meta, signals[i], ft, bpm=bpm, allow_beat_snap=allow_beat_snap, verbose=False)
            osu_texts.append(osu)
            suffix = f" {i + 1}" if num_samples > 1 else ""
            z.writestr(f"{artist} - {title} ({version}{suffix}).osu", osu)
    data = buf.getvalue()

    if output_path is not None:
        Path(output_path).write_bytes(data)
    return data, osu_texts

"""Gradio web UI: audio upload -> .osz download.

Capability parity with reference inference_gradio.py (:173-249): sliders for
CS/AR/OD/HP/SR, artist/title/version fields, optional fixed BPM + beat-snap
toggles, batch count 1-10, sampling steps, CFG scale; generation produces a
downloadable .osz. Unlike the reference (hardcoded dim_h=128, :40), the model
architecture comes from the checkpoint's config.json.

gradio is an optional dependency (not present in every deployment); the
headless surface lives in inference.py / osufusion_tpu.serve.
"""

from __future__ import annotations

import tempfile
from argparse import ArgumentParser
from pathlib import Path

from osufusion_tpu.serve import generate_beatmap, load_model

try:
    import gradio as gr

    HAS_GRADIO = True
except ImportError:  # pragma: no cover - optional dependency
    HAS_GRADIO = False


def build_interface(model, params):
    assert HAS_GRADIO, "gradio is not installed; use inference.py for headless generation"

    def generate(
        audio_file,
        title,
        artist,
        version,
        cs,
        ar,
        od,
        hp,
        sr,
        num_samples,
        steps,
        sampler,
        cfg_scale,
        bpm,
        use_bpm,
        beat_snap,
        seed,
    ):
        out_dir = Path(tempfile.mkdtemp())
        out_path = out_dir / "generated.osz"
        generate_beatmap(
            model,
            params,
            Path(audio_file),
            title=title or "Unknown",
            artist=artist or "Unknown",
            version=version or "OsuFusion",
            cs=cs,
            ar=ar,
            od=od,
            hp=hp,
            sr=sr,
            num_samples=int(num_samples),
            sampling_timesteps=int(steps),
            sampler=None if sampler == "model default" else sampler,
            cond_scale=cfg_scale,
            bpm=float(bpm) if use_bpm else None,
            allow_beat_snap=beat_snap,
            seed=int(seed),
            output_path=out_path,
        )
        return str(out_path)

    with gr.Blocks(title="OsuFusion-TPU") as demo:
        gr.Markdown("# OsuFusion-TPU — generate osu! beatmaps from audio")
        with gr.Row():
            audio = gr.Audio(label="Audio file", type="filepath")
            with gr.Column():
                title = gr.Textbox(label="Title", value="Unknown")
                artist = gr.Textbox(label="Artist", value="Unknown")
                version = gr.Textbox(label="Version", value="OsuFusion")
        with gr.Row():
            cs = gr.Slider(0, 10, value=4.0, label="Circle Size (CS)")
            ar = gr.Slider(0, 10, value=9.0, label="Approach Rate (AR)")
            od = gr.Slider(0, 10, value=9.0, label="Overall Difficulty (OD)")
            hp = gr.Slider(0, 10, value=5.0, label="HP Drain (HP)")
            sr = gr.Slider(0, 20, value=6.0, label="Star Rating (SR)")
        with gr.Row():
            num_samples = gr.Slider(1, 10, value=1, step=1, label="Number of maps")
            steps = gr.Slider(1, 100, value=35, step=1, label="Sampling steps")
            # offer only the samplers the LOADED model supports: rectified
            # flow integrates its own ODE (midpoint), diffusion has ddim/dpm++
            from osufusion_tpu.models import DiffusionModel

            methods = ["ddim", "dpmpp-2m"] if isinstance(model, DiffusionModel) else ["midpoint"]
            # dpmpp-2m is the recommended serving choice: decoded-map parity
            # with DDIM-50 at 16 steps (tests/test_samplers.py). "model
            # default" (DDIM at the model's configured budget) stays the
            # dropdown default for reference parity.
            sampler = gr.Dropdown(
                ["model default", *methods],
                value="model default",
                label="Sampler (dpmpp-2m at ~16 steps: DDIM-50 quality, ~3x faster)",
            )
            cfg_scale = gr.Slider(0, 15, value=2.0, label="CFG scale")
            seed = gr.Number(value=0, label="Seed", precision=0)
        with gr.Row():
            use_bpm = gr.Checkbox(label="Fixed BPM", value=False)
            bpm = gr.Number(value=180.0, label="BPM")
            beat_snap = gr.Checkbox(label="Beat snap", value=True)
        out = gr.File(label="Generated .osz")
        gr.Button("Generate", variant="primary").click(
            generate,
            inputs=[audio, title, artist, version, cs, ar, od, hp, sr, num_samples, steps, sampler, cfg_scale, bpm, use_bpm, beat_snap, seed],
            outputs=out,
        )
    return demo


def main() -> None:
    p = ArgumentParser()
    p.add_argument("--model-path", type=Path, required=True)
    p.add_argument("--config-path", type=Path, default=None)
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=7860)
    args = p.parse_args()

    if not HAS_GRADIO:
        raise SystemExit("gradio is not installed; use inference.py for headless generation")

    model, params = load_model(args.model_path, args.config_path)
    build_interface(model, params).launch(server_name=args.host, server_port=args.port)


if __name__ == "__main__":
    from osufusion_tpu.utils.cache import enable_compilation_cache
    from osufusion_tpu.utils.platform import pin_platform_from_env

    pin_platform_from_env()
    enable_compilation_cache()
    main()

from osufusion_tpu.serve.generate import generate_beatmap, load_model

__all__ = ["generate_beatmap", "load_model"]

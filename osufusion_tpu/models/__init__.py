from osufusion_tpu.models.diffusion import DiffusionModel
from osufusion_tpu.models.rectified_flow import RectifiedFlowModel

__all__ = ["DiffusionModel", "RectifiedFlowModel", "build_model"]


def build_model(model_cfg, diff_cfg):
    """Objective dispatch (reference trainer.py:225 model_class select)."""
    from osufusion_tpu.ops.quant import set_quantization

    # fp8 quantized dots are a process-level trace-time mode (ops/quant.py)
    set_quantization(getattr(model_cfg, "quant", "none"))
    if diff_cfg.objective in ("diffusion", "ddim"):
        return DiffusionModel(model_cfg, diff_cfg)
    if diff_cfg.objective in ("rectified-flow", "rf"):
        return RectifiedFlowModel(model_cfg, diff_cfg)
    raise ValueError(f"unknown objective: {diff_cfg.objective}")

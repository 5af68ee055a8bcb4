from osufusion_tpu.models.diffusion import DiffusionModel
from osufusion_tpu.models.rectified_flow import RectifiedFlowModel

__all__ = ["DiffusionModel", "RectifiedFlowModel", "build_model"]


def build_model(model_cfg, diff_cfg):
    """Objective dispatch (reference trainer.py:225 model_class select)."""
    if diff_cfg.objective in ("diffusion", "ddim"):
        return DiffusionModel(model_cfg, diff_cfg)
    if diff_cfg.objective in ("rectified-flow", "rf"):
        return RectifiedFlowModel(model_cfg, diff_cfg)
    raise ValueError(f"unknown objective: {diff_cfg.objective}")

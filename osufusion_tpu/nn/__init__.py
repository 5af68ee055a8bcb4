from osufusion_tpu.nn.unet import UNet

__all__ = ["UNet"]

"""Image ops: jittable, batched, TPU-friendly building blocks."""

from simplesr_tpu.ops.resize import resize, resize_weights
from simplesr_tpu.ops.metrics import psnr, psnr_on_y, ssim, mse

__all__ = ["resize", "resize_weights", "psnr", "psnr_on_y", "ssim", "mse"]

"""Image ops: jittable, batched, TPU-friendly building blocks."""

from simplesr_tpu.ops.resize import resize, resize_weights
from simplesr_tpu.ops.metrics import psnr, psnr_on_y, ssim, mse
from simplesr_tpu.ops.crop import random_crops, batch_random_crops, diverse_crops
from simplesr_tpu.ops.shuffle import depth_to_space, space_to_depth
from simplesr_tpu.ops.jpeg import jpeg_degrade
from simplesr_tpu.ops.tiling import (
    segment_into_patches,
    reconstruct_from_patches,
    reconstruct_from_overlapping_patches,
    tiled_apply,
    tiled_apply_many,
)
from simplesr_tpu.ops.ensemble import (
    dihedral_transform,
    dihedral_inverse,
    self_ensemble,
    ensemble_predictor,
)
from simplesr_tpu.ops import augment

__all__ = [
    "resize", "resize_weights", "psnr", "psnr_on_y", "ssim", "mse",
    "random_crops", "batch_random_crops", "diverse_crops",
    "depth_to_space", "space_to_depth", "jpeg_degrade",
    "segment_into_patches", "reconstruct_from_patches",
    "reconstruct_from_overlapping_patches", "tiled_apply",
    "tiled_apply_many", "augment",
    "dihedral_transform", "dihedral_inverse", "self_ensemble",
    "ensemble_predictor",
]

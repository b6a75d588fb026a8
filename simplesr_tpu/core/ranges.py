"""Pixel-range normalization contracts.

The framework keeps the reference's asymmetric contract (see
/root/reference/simple_sr/data_pipeline/data_pipeline.py:318-330):

  * raw decoded images: float32 in [0, 255]
  * LR model inputs:    [0, 1]
  * HR targets and generator outputs (tanh): [-1, 1]
  * metrics on [-1, 1] images therefore use max_val=2.0

These functions are jittable and dtype-preserving.
"""

import jax.numpy as jnp


def normalize_01(img):
    """[0, 255] → [0, 1]. Mirrors reference image_transforms.normalize_01
    (/root/reference/simple_sr/utils/image/image_transforms.py:20)."""
    return img / 255.0


def normalize_11(img):
    """[0, 255] → [-1, 1]. Mirrors image_transforms.normalize_11 (:30)."""
    return img / 127.5 - 1.0


def denormalize_11(img):
    """[-1, 1] → [0, 255]. Mirrors image_transforms.denormalize_11 (:40)."""
    return (img + 1.0) * 127.5


def to_11_from_01(img):
    """[0, 1] → [-1, 1] (LR inputs compared against [-1,1] SR outputs)."""
    return img * 2.0 - 1.0


def to_01_from_11(img):
    """[-1, 1] → [0, 1] (used when comparing SR output against [0,1] refs)."""
    return (img + 1.0) * 0.5


def to_uint8(img, from_range="01"):
    """Clip + round to uint8 for host-side rendering."""
    if from_range == "11":
        img = denormalize_11(img)
    elif from_range == "01":
        img = img * 255.0
    return jnp.clip(jnp.round(img), 0, 255).astype(jnp.uint8)

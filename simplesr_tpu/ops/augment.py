"""Image augmentations — batched, jittable, RNG-keyed.

Behavioral parity with reference image_transforms.py (TF eager augmentations,
/root/reference/simple_sr/utils/image/image_transforms.py:157-410): same
default parameter ranges, same math as the tf.image ops they wrap, operating
on float images in [0, 255] exactly like the reference pipeline applies them.

TPU-native design: every augmentation has
  * a deterministic core ``<name>_by(img, factor)`` usable in fused pipelines,
  * a random wrapper ``<name>(key, img, range)`` sampling one factor per call
    (the reference's flat_map applies augmentations per element, so the
    device pipeline calls these under vmap with per-image keys).
The random-fan-out entry point `augment_fanout` mirrors
image_transforms.augment_img (:371): identity + each augmentation.
"""

import jax
import jax.numpy as jnp

__all__ = [
    "flip_along_x", "flip_along_y", "rotate90",
    "adjust_hue", "adjust_saturation", "adjust_brightness",
    "adjust_contrast", "adjust_gamma", "adjust_jpg_quality",
    "augment_fanout", "get_all_available_augmentations",
    "AUGMENTATIONS",
]

DEFAULT_HUE_RANGE = (-0.07, 0.07)
DEFAULT_SATURATION_RANGE = (0.4, 2.0)
DEFAULT_BRIGHTNESS_RANGE = (0.05, 0.2)
DEFAULT_CONTRAST_RANGE = (0.5, 2.5)
DEFAULT_GAMMA_RANGE = (0.5, 1.5)
DEFAULT_JPG_QUALITY_RANGE = (10, 50)


# ---------------------------------------------------------------- color space

def rgb_to_hsv(img):
    """Scale-invariant RGB→HSV (matches tf.image.rgb_to_hsv semantics)."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    rng = v - mn
    safe_rng = jnp.where(rng > 0, rng, 1.0)
    s = jnp.where(v > 0, rng / jnp.where(v > 0, v, 1.0), 0.0)
    hr = jnp.where((v == r), (g - b) / safe_rng, 0.0)
    hg = jnp.where((v == g) & (v != r), 2.0 + (b - r) / safe_rng, 0.0)
    hb = jnp.where((v == b) & (v != r) & (v != g), 4.0 + (r - g) / safe_rng, 0.0)
    h = (hr + hg + hb) / 6.0
    h = jnp.where(rng > 0, jnp.mod(h, 1.0), 0.0)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(img):
    h, s, v = img[..., 0], img[..., 1], img[..., 2]
    dh = jnp.mod(h, 1.0) * 6.0
    i = jnp.floor(dh)
    f = dh - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


# ------------------------------------------------------- deterministic cores

def flip_along_x(img):
    """Flip up-down (reference flip_along_x → tf.image.flip_up_down, :320)."""
    return jnp.flip(img, axis=-3)


def flip_along_y(img):
    """Flip left-right (reference flip_along_y → tf.image.flip_left_right, :334)."""
    return jnp.flip(img, axis=-2)


def rotate90_by(img, rotations):
    """k×90° CCW rotation of (..., H, W, C), static k (tf.image.rot90 math)."""
    k = int(rotations) % 4
    return jnp.rot90(img, k=k, axes=(-3, -2))


def adjust_hue_by(img, delta):
    hsv = rgb_to_hsv(img)
    h = jnp.mod(hsv[..., 0] + delta, 1.0)
    return hsv_to_rgb(jnp.stack([h, hsv[..., 1], hsv[..., 2]], axis=-1))


def adjust_saturation_by(img, factor):
    hsv = rgb_to_hsv(img)
    s = jnp.clip(hsv[..., 1] * factor, 0.0, 1.0)
    return hsv_to_rgb(jnp.stack([hsv[..., 0], s, hsv[..., 2]], axis=-1))


def adjust_brightness_by(img, delta):
    """x + delta, unclipped float math — exact tf.image.adjust_brightness."""
    return img + delta


def adjust_contrast_by(img, factor):
    """(x - mean_HW_per_channel) * factor + mean — tf.image.adjust_contrast."""
    mean = jnp.mean(img, axis=(-3, -2), keepdims=True)
    return (img - mean) * factor + mean


def adjust_gamma_by(img, gamma, gain=1.0):
    """gain * x**gamma — tf.image.adjust_gamma."""
    return gain * jnp.power(jnp.maximum(img, 0.0), gamma)


# ------------------------------------------------------------ random wrappers

def rotate90(key, img, rotations=None):
    """Random 90° rotation. The reference samples tf.random.uniform(minval=1,
    maxval=3, dtype=int32) — i.e. k ∈ {1, 2} (maxval exclusive,
    image_transforms.py:172); matched here.

    XLA needs static shapes: for square images k is sampled from {1, 2} under
    lax.switch; for non-square images only k=2 keeps the shape, so the random
    variant degrades to a 180° rotation (the pipeline crops are square, so
    the square path is the one that matters)."""
    if rotations is not None:
        return rotate90_by(img, rotations)
    if img.shape[-3] != img.shape[-2]:
        return rotate90_by(img, 2)
    k = jax.random.randint(key, (), 1, 3)
    # static unroll under lax.switch — no dynamic shapes
    return jax.lax.switch(k - 1, [lambda x: rotate90_by(x, 1),
                                  lambda x: rotate90_by(x, 2)], img)


def _uniform(key, lo, hi):
    return jax.random.uniform(key, (), minval=lo, maxval=hi)


def adjust_hue(key, img, delta_range=None):
    lo, hi = delta_range or DEFAULT_HUE_RANGE
    return adjust_hue_by(img, _uniform(key, lo, hi))


def adjust_saturation(key, img, factor_range=None):
    lo, hi = factor_range or DEFAULT_SATURATION_RANGE
    return adjust_saturation_by(img, _uniform(key, lo, hi))


def adjust_brightness(key, img, delta_range=None):
    lo, hi = delta_range or DEFAULT_BRIGHTNESS_RANGE
    return adjust_brightness_by(img, _uniform(key, lo, hi))


def adjust_contrast(key, img, factor_range=None):
    lo, hi = factor_range or DEFAULT_CONTRAST_RANGE
    return adjust_contrast_by(img, _uniform(key, lo, hi))


def adjust_gamma(key, img, factor_range=None):
    lo, hi = factor_range or DEFAULT_GAMMA_RANGE
    return adjust_gamma_by(img, _uniform(key, lo, hi))


def adjust_jpg_quality(key, img, quality_range=None):
    """JPEG-degrade with random quality ∈ [lo, hi) (reference
    image_transforms.adjust_jpg_quality, :295). The reference feeds [0,255]
    floats straight into tf.image.adjust_jpeg_quality (which assumes [0,1]
    and saturates); here the op normalizes around the degrade so the
    augmentation is meaningful for [0,255] inputs too."""
    from simplesr_tpu.ops.jpeg import jpeg_degrade
    lo, hi = quality_range or DEFAULT_JPG_QUALITY_RANGE
    quality = jax.random.randint(key, (), lo, hi)
    scale = jnp.where(jnp.max(img) > 1.5, 255.0, 1.0)
    out = jpeg_degrade(img / scale, quality) * scale
    return out.astype(img.dtype)


AUGMENTATIONS = {
    "flip_along_x": lambda key, img: flip_along_x(img),
    "flip_along_y": lambda key, img: flip_along_y(img),
    "rotate90": rotate90,
    "adjust_hue": adjust_hue,
    "adjust_saturation": adjust_saturation,
    "adjust_brightness": adjust_brightness,
    "adjust_contrast": adjust_contrast,
    "adjust_gamma": adjust_gamma,
    "adjust_jpg_quality": adjust_jpg_quality,
}


def get_all_available_augmentations():
    """Name list, mirroring image_transforms.get_all_available_augmentations
    (:396)."""
    return list(AUGMENTATIONS)


def augment_fanout(key, img, augmentations):
    """Identity + each augmentation of one image — the reference's flat_map
    fan-out (image_transforms.augment_img, :371). ``augmentations`` is a list
    of names or (key, img)→img callables. Returns (1+len(augs), H, W, C)."""
    outs = [img]
    keys = jax.random.split(key, max(len(augmentations), 1))
    for k, aug in zip(keys, augmentations):
        fn = AUGMENTATIONS[aug] if isinstance(aug, str) else aug
        outs.append(fn(k, img))
    return jnp.stack(outs, axis=0)

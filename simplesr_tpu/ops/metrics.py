"""Image quality metrics: PSNR, PSNR-on-Y, SSIM — jittable, TF-compatible.

Behavioral parity with reference simple_sr/utils/image/metrics.py (which
delegates to tf.image.psnr/ssim with default max_val=2.0 for [-1,1] images).
SSIM follows tf.image.ssim's formulation: 11×11 Gaussian window (σ=1.5),
k1=0.01, k2=0.03, valid-padding, per-channel maps averaged over space and
channels. Implemented as separable depthwise convolutions so XLA fuses the
whole metric into a handful of kernels.
"""

import functools

import numpy as np
import jax.numpy as jnp
from jax import lax

__all__ = ["psnr", "psnr_on_y", "ssim", "mse"]


def _flatten_to_nhwc(x):
    x = jnp.asarray(x, jnp.float32)
    if x.ndim == 3:
        return x[None], True
    if x.ndim == 4:
        return x, False
    raise ValueError(f"expected rank 3 or 4 image tensor, got rank {x.ndim}")


def mse(a, b):
    a, squeeze = _flatten_to_nhwc(a)
    b, _ = _flatten_to_nhwc(b)
    out = jnp.mean((a - b) ** 2, axis=(1, 2, 3))
    return out[0] if squeeze else out


def psnr(tensor1, tensor2, max_val=2.0):
    """Peak signal-to-noise ratio per image; rank 3 or 4 inputs.

    Mirrors reference metrics.psnr (/root/reference/simple_sr/utils/image/
    metrics.py:4): default max_val=2.0 because images live in [-1, 1].
    """
    a, squeeze = _flatten_to_nhwc(tensor1)
    b, _ = _flatten_to_nhwc(tensor2)
    err = jnp.mean((a - b) ** 2, axis=(1, 2, 3))
    out = 10.0 * (2.0 * jnp.log10(max_val) - jnp.log10(err))
    return out[0] if squeeze else out


# TF's rgb_to_yuv Y row (ITU-R BT.601 luma coefficients). Kept as a host
# constant: a module-level jnp.array would initialize the XLA backend at
# import time, which breaks multi-host users who must call
# jax.distributed.initialize AFTER importing the library
# (tests/parallel/test_import_no_backend_init.py pins this).
_Y_WEIGHTS = np.array([0.299, 0.587, 0.114], dtype=np.float32)


def rgb_to_y(img):
    """Y (luma) channel, keepdims; matches tf.image.rgb_to_yuv's Y row."""
    return jnp.tensordot(jnp.asarray(img, jnp.float32), _Y_WEIGHTS, axes=([-1], [0]))[..., None]


def psnr_on_y(tensor1, tensor2, max_val=2.0):
    """PSNR on the Y (luma) channel — reference metrics.psnr_on_y (:18)."""
    if tensor1.shape != tensor2.shape:
        raise ValueError("tensors need to have the same shape")
    if tensor1.ndim > 4 or tensor1.ndim < 3:
        raise ValueError("tensors need to be either of rank 4 or rank 3")
    return psnr(rgb_to_y(tensor1), rgb_to_y(tensor2), max_val=max_val)


@functools.lru_cache(maxsize=8)
def _gaussian_window_np(size: int, sigma: float):
    coords = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(coords**2) / (2.0 * sigma**2))
    g /= g.sum()
    return g.astype(np.float32)


def _depthwise_sep_filter(x, win):
    """Separable depthwise 'valid' filter over H and W of an NHWC tensor."""
    c = x.shape[-1]
    kh = jnp.asarray(win).reshape(-1, 1, 1, 1)  # (K,1,1,1) HWIO
    kh = jnp.tile(kh, (1, 1, 1, c))
    kw = jnp.asarray(win).reshape(1, -1, 1, 1)
    kw = jnp.tile(kw, (1, 1, 1, c))
    dn = lax.conv_dimension_numbers(x.shape, kh.shape, ("NHWC", "HWIO", "NHWC"))
    x = lax.conv_general_dilated(x, kh, (1, 1), "VALID", dimension_numbers=dn,
                                 feature_group_count=c, precision="highest")
    x = lax.conv_general_dilated(x, kw, (1, 1), "VALID", dimension_numbers=dn,
                                 feature_group_count=c, precision="highest")
    return x


def ssim(tensor1, tensor2, max_val=2.0, filter_size=11, filter_sigma=1.5,
         k1=0.01, k2=0.03):
    """Structural similarity per image; rank 3 or 4 inputs.

    Matches tf.image.ssim (the reference's backing implementation,
    metrics.py:48): Gaussian-weighted moments, valid padding, mean over
    space and channels.
    """
    a, squeeze = _flatten_to_nhwc(tensor1)
    b, _ = _flatten_to_nhwc(tensor2)
    win = _gaussian_window_np(int(filter_size), float(filter_sigma))

    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2

    mu_a = _depthwise_sep_filter(a, win)
    mu_b = _depthwise_sep_filter(b, win)
    mu_aa = _depthwise_sep_filter(a * a, win)
    mu_bb = _depthwise_sep_filter(b * b, win)
    mu_ab = _depthwise_sep_filter(a * b, win)

    var_a = mu_aa - mu_a * mu_a
    var_b = mu_bb - mu_b * mu_b
    cov_ab = mu_ab - mu_a * mu_b

    luminance = (2.0 * mu_a * mu_b + c1) / (mu_a**2 + mu_b**2 + c1)
    cs = (2.0 * cov_ab + c2) / (var_a + var_b + c2)
    ssim_map = luminance * cs
    out = jnp.mean(ssim_map, axis=(1, 2, 3))
    return out[0] if squeeze else out

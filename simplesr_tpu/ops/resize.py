"""Separable image resize as precomputed weight-matrix contractions.

TPU-native design: instead of a gather-based sampler (reference:
tf.image.resize, /root/reference/simple_sr/utils/image/image_transforms.py:348),
each spatial axis is resampled by a dense (out, in) weight matrix applied with
`jnp.einsum` — two matmuls that XLA tiles straight onto the MXU. Weights are
computed once on host per (in, out, method, antialias) and become jit
constants, so the hot path is pure MXU work with no dynamic shapes.

Numerics match TF2's `tf.image.resize(..., antialias=True)` / `jax.image.resize`
(the scale-and-translate formulation): half-pixel sampling, kernel scaled by
the downscale factor when antialiasing, out-of-range taps dropped and rows
renormalized to sum 1. Matching this exactly matters because the reference's
LR training distribution is defined by TF's antialiased bicubic downscale
(SURVEY.md §7 "hard parts" #1; reference test
tests/data_pipeline/test_data_pipeline.py:147-158 asserts LR↔HR SSIM≈1).
"""

import functools

import numpy as np
import jax.numpy as jnp

__all__ = ["resize", "resize_weights", "METHODS"]


def _kernel_triangle(x):
    return np.maximum(0.0, 1.0 - np.abs(x))


def _keys_cubic(x, a):
    x = np.abs(x)
    return np.where(
        x <= 1.0,
        ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0,
        np.where(x < 2.0, ((a * x - 5.0 * a) * x + 8.0 * a) * x - 4.0 * a, 0.0),
    )


def _kernel_keys_cubic(x):
    """Keys cubic, a = -0.5 (Catmull-Rom) — what TF2/jax use for 'bicubic'."""
    return _keys_cubic(x, -0.5)


def _sinc(x):
    return np.sinc(x)


def _kernel_lanczos(x, radius):
    return np.where(np.abs(x) < radius, _sinc(x) * _sinc(x / radius), 0.0)


def _kernel_box(x):
    # Half-open box matching area-style resampling.
    return np.where(np.abs(x) <= 0.5, 1.0, 0.0)


METHODS = {
    # name: (kernel_fn, support_radius)
    "bilinear": (_kernel_triangle, 1.0),
    "triangle": (_kernel_triangle, 1.0),
    "bicubic": (_kernel_keys_cubic, 2.0),
    "cubic": (_kernel_keys_cubic, 2.0),
    "lanczos3": (functools.partial(_kernel_lanczos, radius=3.0), 3.0),
    "lanczos5": (functools.partial(_kernel_lanczos, radius=5.0), 5.0),
    "area": (_kernel_box, 0.5),
    "box": (_kernel_box, 0.5),
}


@functools.lru_cache(maxsize=256)
def _resize_weights_np(in_size: int, out_size: int, method: str, antialias: bool):
    """Dense (out_size, in_size) resampling matrix, float32 numpy."""
    if method not in METHODS:
        raise ValueError(f"unknown resize method {method!r}; options: {sorted(METHODS)}")
    kernel, support = METHODS[method]
    scale = out_size / in_size
    # When downscaling with antialias, widen the kernel by 1/scale.
    kscale = scale if (antialias and scale < 1.0) else 1.0
    i = np.arange(out_size, dtype=np.float64)
    sample_f = (i + 0.5) / scale - 0.5  # half-pixel centers, input coords
    if method in ("bicubic", "cubic") and not antialias:
        # TF quirk (verified empirically against TF 2.21): the non-antialiased
        # bicubic path quantizes the fractional sample position to a
        # 1024-entry coefficient LUT before evaluating the Keys kernel.
        lo = np.floor(sample_f)
        frac = np.floor((sample_f - lo) * 1024.0 + 0.5) / 1024.0
        sample_f = lo + frac
    j = np.arange(in_size, dtype=np.float64)
    x = (j[None, :] - sample_f[:, None]) * kscale
    w = kernel(x)
    w = np.where(np.abs(x) <= support + 1e-9, w, 0.0)
    row_sum = w.sum(axis=1, keepdims=True)
    # Degenerate rows can only happen for pathological sizes; guard anyway.
    w = w / np.where(row_sum == 0.0, 1.0, row_sum)
    return w.astype(np.float32)


def resize_weights(in_size, out_size, method="bilinear", antialias=True):
    """jnp view of the cached resampling matrix (shape (out, in))."""
    return jnp.asarray(_resize_weights_np(int(in_size), int(out_size), method, bool(antialias)))


def _nearest(img, size):
    h_out, w_out = size
    h_in, w_in = img.shape[-3], img.shape[-2]
    # TF v2 nearest: floor((i + 0.5) * in/out)
    rows = np.clip(np.floor((np.arange(h_out) + 0.5) * h_in / h_out), 0, h_in - 1).astype(np.int32)
    cols = np.clip(np.floor((np.arange(w_out) + 0.5) * w_in / w_out), 0, w_in - 1).astype(np.int32)
    return img[..., rows, :, :][..., :, cols, :]


def resize(img, size, method="bilinear", antialias=True, dtype=None):
    """Resize NHWC (or HWC, or any (..., H, W, C)) images to ``size=(H', W')``.

    Equivalent surface to reference image_transforms.resize
    (/root/reference/simple_sr/utils/image/image_transforms.py:348) but
    executed as two MXU matmuls; jittable with static shapes.

    Args:
      img: (..., H, W, C) array.
      size: (new_height, new_width).
      method: one of METHODS or "nearest".
      antialias: widen the kernel when downscaling (TF2 semantics).
      dtype: accumulation dtype; default f32 (bf16 inputs are upcast — resize
        defines the training distribution, keep it exact).
    """
    h_out, w_out = int(size[0]), int(size[1])
    h_in, w_in = img.shape[-3], img.shape[-2]
    if method == "nearest":
        return _nearest(img, (h_out, w_out))
    orig_dtype = img.dtype
    acc = dtype or jnp.float32
    x = jnp.asarray(img, acc)
    if h_out != h_in:
        wh = resize_weights(h_in, h_out, method, antialias).astype(acc)
        x = jnp.einsum("oh,...hwc->...owc", wh, x, precision="highest")
    if w_out != w_in:
        ww = resize_weights(w_in, w_out, method, antialias).astype(acc)
        x = jnp.einsum("pw,...owc->...opc", ww, x, precision="highest")
    if jnp.issubdtype(orig_dtype, jnp.floating) and orig_dtype != acc and dtype is None:
        # keep f32 result by default (parity with TF which returns f32)
        return x
    return x.astype(orig_dtype) if dtype is None else x

"""Resize parity vs TF2 (`tf.image.resize`) — the reference's resize backend —
and vs jax.image.resize. Mirrors the reference's LR↔HR correspondence
invariant (reference tests/data_pipeline/test_data_pipeline.py:147-158)."""

import numpy as np
import pytest
import jax.numpy as jnp

from simplesr_tpu.ops import resize, psnr, ssim


def _tf():
    import tensorflow as tf
    return tf


@pytest.mark.parametrize("method", ["bilinear", "bicubic", "lanczos3"])
@pytest.mark.parametrize("antialias", [True, False])
@pytest.mark.parametrize("shape,size", [
    ((64, 64, 3), (16, 16)),     # 4x downscale
    ((64, 48, 3), (32, 24)),     # 2x downscale, non-square
    ((16, 16, 3), (64, 64)),     # 4x upscale
    ((50, 70, 3), (33, 21)),     # non-integer factors
])
def test_resize_matches_tf(rng, method, antialias, shape, size):
    tf = _tf()
    img = rng.uniform(0, 255, size=shape).astype(np.float32)
    ours = np.asarray(resize(img, size, method=method, antialias=antialias))
    theirs = tf.image.resize(img, size, method=method, antialias=antialias).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-3)


def test_resize_batched_matches_single(rng):
    imgs = rng.uniform(0, 255, size=(4, 32, 32, 3)).astype(np.float32)
    batched = np.asarray(resize(imgs, (8, 8), method="bicubic"))
    singles = np.stack([np.asarray(resize(i, (8, 8), method="bicubic")) for i in imgs])
    np.testing.assert_allclose(batched, singles, rtol=1e-6, atol=1e-5)


def test_identity_resize_is_noop(rng):
    img = rng.uniform(0, 1, size=(17, 23, 3)).astype(np.float32)
    out = np.asarray(resize(img, (17, 23), method="bicubic"))
    np.testing.assert_array_equal(out, img)


def test_nearest_matches_tf(rng):
    tf = _tf()
    img = rng.uniform(0, 255, size=(20, 30, 3)).astype(np.float32)
    ours = np.asarray(resize(img, (10, 15), method="nearest"))
    theirs = tf.image.resize(img, (10, 15), method="nearest").numpy()
    np.testing.assert_allclose(ours, theirs)


def test_lr_hr_correspondence_property(rng):
    """Downscaling HR by the model scale must reproduce the paired LR — the
    core dataset invariant of the reference (SSIM≈1, MSE≈0)."""
    hr = rng.uniform(0, 255, size=(96, 96, 3)).astype(np.float32)
    lr = resize(hr / 255.0, (24, 24), method="bicubic", antialias=True)
    lr2 = resize(jnp.asarray(hr) / 255.0, (24, 24), method="bicubic", antialias=True)
    assert float(ssim(lr, lr2, max_val=1.0)) > 0.999
    assert float(psnr(lr, lr2, max_val=1.0)) > 60.0


def test_upscale_then_exact_shapes():
    img = jnp.zeros((1, 13, 17, 3))
    out = resize(img, (52, 68), method="bicubic")
    assert out.shape == (1, 52, 68, 3)

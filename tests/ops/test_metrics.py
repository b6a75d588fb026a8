"""Metric parity vs tf.image (the reference's backing impl,
reference simple_sr/utils/image/metrics.py) + sanity invariants mirroring
reference tests/utils/image/test_metrics.py."""

import numpy as np
import pytest

from simplesr_tpu.ops import psnr, psnr_on_y, ssim


def _tf():
    import tensorflow as tf
    return tf


def test_psnr_identical_images_is_inf(rng):
    img = rng.uniform(-1, 1, size=(32, 32, 3)).astype(np.float32)
    assert np.isinf(float(psnr(img, img)))
    assert np.isinf(float(psnr_on_y(img, img)))


def test_ssim_identical_images_is_one(rng):
    img = rng.uniform(-1, 1, size=(32, 32, 3)).astype(np.float32)
    assert float(ssim(img, img)) == pytest.approx(1.0, abs=1e-5)


@pytest.mark.parametrize("max_val", [1.0, 2.0, 255.0])
def test_psnr_matches_tf(rng, max_val):
    tf = _tf()
    a = rng.uniform(0, max_val, size=(2, 40, 40, 3)).astype(np.float32)
    b = rng.uniform(0, max_val, size=(2, 40, 40, 3)).astype(np.float32)
    ours = np.asarray(psnr(a, b, max_val=max_val))
    theirs = tf.image.psnr(a, b, max_val=max_val).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4)


@pytest.mark.parametrize("max_val", [1.0, 2.0])
def test_ssim_matches_tf(rng, max_val):
    tf = _tf()
    a = rng.uniform(0, 1, size=(2, 48, 48, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.05, size=a.shape), 0, 1).astype(np.float32)
    ours = np.asarray(ssim(a, b, max_val=max_val))
    theirs = tf.image.ssim(a, b, max_val=max_val).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


def test_psnr_on_y_matches_handrolled(rng):
    """Reference test computes Y-PSNR by hand (tests/utils/image/
    test_metrics.py:29-41); replicate with the BT.601 luma transform."""
    a = rng.uniform(0, 1, size=(24, 24, 3)).astype(np.float32)
    b = rng.uniform(0, 1, size=(24, 24, 3)).astype(np.float32)
    w = np.array([0.299, 0.587, 0.114], dtype=np.float32)
    ya, yb = a @ w, b @ w
    expected = 10 * np.log10(1.0 / np.mean((ya - yb) ** 2))
    got = float(psnr_on_y(a, b, max_val=1.0))
    assert got == pytest.approx(expected, rel=1e-4)


def test_rank3_and_rank4_agree(rng):
    a = rng.uniform(-1, 1, size=(28, 28, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, size=(28, 28, 3)).astype(np.float32)
    assert float(psnr(a, b)) == pytest.approx(float(psnr(a[None], b[None])[0]), rel=1e-6)
    assert float(ssim(a, b)) == pytest.approx(float(ssim(a[None], b[None])[0]), rel=1e-6)
    with pytest.raises(ValueError):
        psnr_on_y(a, b[None])

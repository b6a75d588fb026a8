"""Augmentation parity vs tf.image (the reference's backing ops) for the
deterministic cores, plus randomness/fan-out invariants."""

import numpy as np
import pytest
import jax

from simplesr_tpu.ops import augment


def _tf():
    import tensorflow as tf
    return tf


@pytest.fixture
def img(rng):
    return rng.uniform(0, 255, size=(24, 32, 3)).astype(np.float32)


def test_flips_match_tf(img):
    tf = _tf()
    np.testing.assert_array_equal(
        np.asarray(augment.flip_along_x(img)), tf.image.flip_up_down(img).numpy())
    np.testing.assert_array_equal(
        np.asarray(augment.flip_along_y(img)), tf.image.flip_left_right(img).numpy())


@pytest.mark.parametrize("k", [1, 2, 3])
def test_rot90_matches_tf(img, k):
    tf = _tf()
    np.testing.assert_array_equal(
        np.asarray(augment.rotate90_by(img, k)), tf.image.rot90(img, k).numpy())


@pytest.mark.parametrize("delta", [-0.07, 0.03, 0.07])
def test_hue_matches_tf(img, delta):
    tf = _tf()
    ours = np.asarray(augment.adjust_hue_by(img / 255.0, delta))
    theirs = tf.image.adjust_hue(img / 255.0, delta).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


@pytest.mark.parametrize("factor", [0.4, 1.3, 2.0])
def test_saturation_matches_tf(img, factor):
    tf = _tf()
    ours = np.asarray(augment.adjust_saturation_by(img / 255.0, factor))
    theirs = tf.image.adjust_saturation(img / 255.0, factor).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


def test_brightness_contrast_gamma_match_tf(img):
    tf = _tf()
    np.testing.assert_allclose(
        np.asarray(augment.adjust_brightness_by(img, 0.15)),
        tf.image.adjust_brightness(img, 0.15).numpy(), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(augment.adjust_contrast_by(img, 1.7)),
        tf.image.adjust_contrast(img, 1.7).numpy(), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(augment.adjust_gamma_by(img / 255.0, 0.8)),
        tf.image.adjust_gamma(img / 255.0, 0.8).numpy(), rtol=1e-4)


def test_random_wrappers_sample_within_range(img):
    key = jax.random.key(0)
    out = augment.adjust_brightness(key, img, (0.05, 0.2))
    delta = float(np.asarray(out - img).mean())
    assert 0.05 <= delta <= 0.2
    a = np.asarray(augment.rotate90(jax.random.key(1), img))
    assert a.shape in [(24, 32, 3), (32, 24, 3)]


def test_fanout_identity_plus_each(img):
    augs = ["flip_along_x", "flip_along_y", "rotate90"]
    out = augment.augment_fanout(jax.random.key(0), img, augs)
    assert out.shape[0] == 1 + len(augs)
    np.testing.assert_array_equal(np.asarray(out[0]), img)
    np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(augment.flip_along_x(img)))


def test_registry_complete():
    names = augment.get_all_available_augmentations()
    for n in ["flip_along_x", "flip_along_y", "rotate90", "adjust_hue",
              "adjust_saturation", "adjust_brightness", "adjust_contrast",
              "adjust_gamma", "adjust_jpg_quality"]:
        assert n in names


def test_hsv_roundtrip(rng):
    x = rng.uniform(0, 1, size=(16, 16, 3)).astype(np.float32)
    back = np.asarray(augment.hsv_to_rgb(augment.rgb_to_hsv(x)))
    np.testing.assert_allclose(back, x, atol=1e-5)

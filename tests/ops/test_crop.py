import numpy as np
import pytest
import jax

from simplesr_tpu.ops import random_crops, batch_random_crops, diverse_crops


def test_random_crops_shapes_and_membership(rng):
    img = rng.uniform(0, 255, size=(64, 80, 3)).astype(np.float32)
    crops = random_crops(jax.random.key(0), img, 5, (32, 32))
    assert crops.shape == (5, 32, 32, 3)
    # every crop must be an actual sub-window of the image
    crops_np = np.asarray(crops)
    for c in crops_np:
        found = False
        for t in range(64 - 32 + 1):
            for l in range(80 - 32 + 1):
                if np.array_equal(img[t:t + 32, l:l + 32], c):
                    found = True
                    break
            if found:
                break
        assert found


def test_random_crops_are_random():
    img = np.arange(64 * 64 * 3, dtype=np.float32).reshape(64, 64, 3)
    a = np.asarray(random_crops(jax.random.key(1), img, 4, (16, 16)))
    b = np.asarray(random_crops(jax.random.key(2), img, 4, (16, 16)))
    assert not np.array_equal(a, b)
    # same key → deterministic
    c = np.asarray(random_crops(jax.random.key(1), img, 4, (16, 16)))
    np.testing.assert_array_equal(a, c)


def test_batch_random_crops(rng):
    imgs = rng.uniform(0, 255, size=(3, 48, 48, 3)).astype(np.float32)
    crops = batch_random_crops(jax.random.key(0), imgs, 4, (16, 16))
    assert crops.shape == (12, 16, 16, 3)


def test_patch_too_large_raises(rng):
    img = rng.uniform(0, 1, size=(16, 16, 3)).astype(np.float32)
    with pytest.raises(ValueError):
        random_crops(jax.random.key(0), img, 1, (32, 32))


def test_diverse_crops_prefers_structure():
    """Left half of the image is flat, right half is noise; diversity cropping
    with a std threshold must pick from the noisy side (the reference's
    crop_divers intent, image_transforms.py:83)."""
    rng = np.random.default_rng(0)
    img = np.zeros((64, 128, 3), dtype=np.float32)
    img[:, 64:, :] = rng.uniform(0, 255, size=(64, 64, 3))
    crops = diverse_crops(jax.random.key(3), img, 4, (16, 16),
                          min_variation_patch=10.0, oversample=16)
    assert crops.shape == (4, 16, 16, 3)
    stds = np.asarray(crops).reshape(4, -1).std(axis=1)
    assert (stds > 10.0).all()


def test_diverse_crops_fallback_when_impossible():
    img = np.full((32, 32, 3), 7.0, dtype=np.float32)  # zero variation anywhere
    crops = diverse_crops(jax.random.key(0), img, 3, (8, 8),
                          min_variation_patch=1.0)
    assert crops.shape == (3, 8, 8, 3)
    np.testing.assert_array_equal(np.asarray(crops), np.full((3, 8, 8, 3), 7.0))

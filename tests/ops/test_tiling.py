"""Tile/stitch round-trip invariants, mirroring reference
tests/utils/image/test_image_utils.py:42-117 — segment→reconstruct must be
EXACT (MSE 0) for synthetic and real images, with and without overlap."""

import numpy as np
import pytest
import jax.numpy as jnp
from PIL import Image

from simplesr_tpu.ops import (
    segment_into_patches,
    reconstruct_from_patches,
    reconstruct_from_overlapping_patches,
    tiled_apply,
    psnr,
    ssim,
)


def _lena():
    return np.asarray(
        Image.open("/root/reference/tests/data/lena.png"), dtype=np.float32
    )


@pytest.mark.parametrize("patch", [16, 32, 64])
def test_roundtrip_exact_no_overlap(rng, patch):
    img = rng.uniform(0, 255, size=(96, 128, 3)).astype(np.float32)
    patches, padding = segment_into_patches(img, patch_width=patch, patch_height=patch)
    rec = reconstruct_from_patches(
        jnp.asarray(patches), 96, 128,
        horizontal_padding=padding[0][1], vertical_padding=padding[1][1],
    )
    np.testing.assert_array_equal(np.asarray(rec), img)


@pytest.mark.parametrize("patch,overlap", [(32, 8), (64, 16), (128, 32)])
def test_roundtrip_exact_with_overlap_real_image(patch, overlap):
    img = _lena()
    patches, padding = segment_into_patches(
        img, patch_width=patch, patch_height=patch, pixel_overlap=overlap
    )
    assert patches.shape[1] == patch + 2 * overlap
    rec = reconstruct_from_overlapping_patches(
        patches, img.shape[0], img.shape[1], overlap,
        padding[0][1] - overlap, padding[1][1] - overlap,
    )
    np.testing.assert_array_equal(np.asarray(rec), img)
    assert np.isinf(float(psnr(rec, jnp.asarray(img), max_val=255.0)))
    assert float(ssim(rec, jnp.asarray(img), max_val=255.0)) == pytest.approx(1.0, abs=1e-6)


def test_non_divisible_sizes_padded(rng):
    img = rng.uniform(0, 255, size=(50, 70, 3)).astype(np.float32)
    patches, padding = segment_into_patches(img, 32, 32, pixel_overlap=4)
    assert padding[0] == [4, 4 + 14] and padding[1] == [4, 4 + 26]
    rec = reconstruct_from_overlapping_patches(
        patches, 50, 70, 4, padding[0][1] - 4, padding[1][1] - 4
    )
    np.testing.assert_array_equal(np.asarray(rec), img)


def test_patch_larger_than_image_raises(rng):
    img = rng.uniform(0, 1, size=(16, 16, 3)).astype(np.float32)
    with pytest.raises(ValueError):
        segment_into_patches(img, 32, 32)


def test_rank_checks(rng):
    with pytest.raises(ValueError):
        segment_into_patches(np.zeros((2, 16, 16, 3)))
    with pytest.raises(ValueError):
        reconstruct_from_patches(np.zeros((16, 16, 3)), 16, 16)
    with pytest.raises(ValueError):
        reconstruct_from_patches(np.zeros((1, 16, 16, 3)), 16, 16, horizontal_padding=-1)


def test_tiled_apply_matches_direct():
    """Tiled SR (here: nearest ×2 'model') must equal direct application —
    the seam-free guarantee behind the reference's efficient-inference path
    (operations/evaluation.py:256-276)."""
    img = _lena()[:200, :300, :]

    def fake_sr(batch):  # nearest x2 is shift-invariant → tiling must be exact
        return jnp.repeat(jnp.repeat(batch, 2, axis=1), 2, axis=2)

    out = tiled_apply(fake_sr, jnp.asarray(img), patch_size=(64, 64), overlap=8,
                      scale=2, batch_size=4)
    direct = np.asarray(fake_sr(jnp.asarray(img)[None]))[0]
    assert out.shape == (400, 600, 3)
    np.testing.assert_array_equal(np.asarray(out), direct)


def test_tiled_apply_many_matches_per_image(rng):
    """Pooling several (different-sized) images' patches through shared
    chunks must produce exactly what per-image tiled_apply produces."""
    from simplesr_tpu.ops import tiled_apply, tiled_apply_many

    def fake_sr(batch):  # x2 "model": nearest-neighbor blowup
        return jnp.repeat(jnp.repeat(batch, 2, axis=1), 2, axis=2)

    imgs = [jnp.asarray(rng.uniform(size=s).astype(np.float32))
            for s in [(200, 260, 3), (140, 180, 3), (260, 200, 3)]]
    pooled = tiled_apply_many(fake_sr, imgs, (64, 64), overlap=16, scale=2,
                              batch_size=8)
    for img, out in zip(imgs, pooled):
        single = tiled_apply(fake_sr, img, (64, 64), overlap=16, scale=2,
                             batch_size=8)
        assert out.shape == (img.shape[0] * 2, img.shape[1] * 2, 3)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(single))


def test_tiled_apply_many_pools_chunks(rng):
    """Cross-image pooling must leave at most ONE ragged chunk total (the
    whole point: per-image chunking pads up to batch_size-1 slots per
    image)."""
    from simplesr_tpu.ops import tiled_apply_many

    calls = []

    def fake_sr(batch):
        calls.append(batch.shape[0])
        return jnp.repeat(jnp.repeat(batch, 2, axis=1), 2, axis=2)

    # 3 images x 9 patches (3x3 grid each) = 27 patches; batch 8 -> 4 calls
    imgs = [jnp.asarray(rng.uniform(size=(190, 190, 3)).astype(np.float32))
            for _ in range(3)]
    tiled_apply_many(fake_sr, imgs, (64, 64), overlap=16, scale=2, batch_size=8)
    assert len(calls) == 4  # per-image chunking would need 6 (2 per image)
    assert all(c == 8 for c in calls)

"""Numeric comparison of diverse_crops' SELECTION DISTRIBUTION against the
reference's rejection-sampling crop_divers
(/root/reference/simple_sr/utils/image/image_transforms.py:83-148), run
directly from the reference source as the oracle.

The implementations can't be bit-equal (different RNGs, rejection loop vs
bounded oversample→re-rank), so parity is asserted on the distribution of
what gets selected, over many seeds on the same image:

  * acceptance property: with a satisfiable threshold, all selected patches
    clear min_variation_patch in both implementations;
  * the mean/min per-patch std of the selection agree within tolerance;
  * both leave the threshold-free selection unbiased (≈ naive cropping);
  * the batch-diversity re-rank matches the reference's accept-or-retry
    outcome (std of patch means above min_variation_batch when
    satisfiable).
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from simplesr_tpu.ops.crop import diverse_crops


@pytest.fixture(scope="module")
def ref_transforms():
    tf = pytest.importorskip("tensorflow")
    # Appended (not prepended) and removed after import: the reference tree
    # has its own `examples/` package that would otherwise shadow ours for
    # every test collected after this module.
    sys.path.append("/root/reference")
    try:
        from simple_sr.utils.image import image_transforms
    finally:
        sys.path.remove("/root/reference")
    return image_transforms


@pytest.fixture(scope="module")
def test_img():
    # half flat / half textured image: makes the patch threshold selective
    rng = np.random.default_rng(7)
    img = np.full((96, 96, 3), 0.4, np.float32)
    img[:, 48:] = rng.uniform(0, 1, (96, 48, 3)).astype(np.float32)
    return img


PATCH = (24, 24, 3)
N_CROPS = 6
MIN_PATCH_STD = 0.15  # flat half ≈ 0, textured half ≈ 0.29
SEEDS = 12


def _ref_selection_stats(ref_transforms, img, min_batch):
    stds, mean_spreads = [], []
    for _ in range(SEEDS):
        crops = np.asarray(ref_transforms.crop_divers(
            img, N_CROPS, PATCH, min_variation_patch=MIN_PATCH_STD,
            min_variation_batch=min_batch))
        stds.append(crops.reshape(N_CROPS, -1).std(axis=1))
        mean_spreads.append(crops.reshape(N_CROPS, -1).mean(axis=1).std())
    return np.concatenate(stds), np.asarray(mean_spreads)


def _our_selection_stats(img, min_batch):
    stds, mean_spreads = [], []
    for seed in range(SEEDS):
        crops = np.asarray(diverse_crops(
            jax.random.key(seed), jnp.asarray(img), N_CROPS, PATCH[:2],
            min_variation_patch=MIN_PATCH_STD, min_variation_batch=min_batch))
        stds.append(crops.reshape(N_CROPS, -1).std(axis=1))
        mean_spreads.append(crops.reshape(N_CROPS, -1).mean(axis=1).std())
    return np.concatenate(stds), np.asarray(mean_spreads)


def test_patch_threshold_selection_matches_reference(ref_transforms, test_img):
    ref_stds, _ = _ref_selection_stats(ref_transforms, test_img, min_batch=0.0)
    our_stds, _ = _our_selection_stats(test_img, min_batch=0.0)

    # acceptance property: everything selected clears the threshold in both
    # (the image has far more passing area than N_CROPS patches need)
    assert (ref_stds > MIN_PATCH_STD).all()
    assert (our_stds > MIN_PATCH_STD).all()

    # selection distributions agree: mean/min of selected per-patch stds
    assert abs(ref_stds.mean() - our_stds.mean()) < 0.03, \
        (ref_stds.mean(), our_stds.mean())
    assert abs(ref_stds.min() - our_stds.min()) < 0.05


def test_batch_diversity_outcome_matches_reference(ref_transforms, test_img):
    min_batch = 0.02  # satisfiable on this image
    _, ref_spread = _ref_selection_stats(ref_transforms, test_img, min_batch)
    _, our_spread = _our_selection_stats(test_img, min_batch)
    # the accept-or-retry loop and the deterministic re-rank must land in
    # the same place: batches whose patch-mean spread clears the bar
    assert (ref_spread > min_batch).mean() >= 0.9
    assert (our_spread > min_batch).mean() >= 0.9
    assert abs(ref_spread.mean() - our_spread.mean()) < 0.03


def test_unsatisfiable_threshold_degrades_like_reference(ref_transforms):
    """On a flat image nothing clears the bar: the reference maxes out its
    retries and takes arbitrary patches; ours falls back to highest-std
    rejects. Both must return the full crop count."""
    flat = np.full((64, 64, 3), 0.5, np.float32)
    ref = np.asarray(ref_transforms.crop_divers(
        flat, N_CROPS, PATCH, min_variation_patch=0.5,
        min_variation_batch=0.5, max_trys_patch=10, max_trys_batch=2))
    ours = np.asarray(diverse_crops(
        jax.random.key(0), jnp.asarray(flat), N_CROPS, PATCH[:2],
        min_variation_patch=0.5, min_variation_batch=0.5))
    assert ref.shape == (N_CROPS, *PATCH)
    assert ours.shape == (N_CROPS, *PATCH)

"""Pallas patch-extraction kernel semantics (interpreter mode on CPU; the
compiled path is exercised on TPU where it is 1.6× the gather path)."""

import numpy as np
import pytest
import jax.numpy as jnp

from simplesr_tpu.ops.pallas import extract_overlapping_patches_pallas
from simplesr_tpu.ops.tiling import segment_into_patches


def test_matches_gather_path(rng):
    img = jnp.asarray(rng.uniform(0, 255, (300, 260, 3)), jnp.float32)
    ref, padding = segment_into_patches(img, 128, 128, 32)
    padded = jnp.pad(img, [[padding[0][0], padding[0][1]],
                           [padding[1][0], padding[1][1]], [0, 0]])
    got = extract_overlapping_patches_pallas(padded, 128, 128, 32,
                                             interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_unaligned_patch_raises(rng):
    img = jnp.asarray(rng.uniform(size=(128, 128, 3)), jnp.float32)
    with pytest.raises(ValueError):
        extract_overlapping_patches_pallas(img, 50, 50, 8, interpret=True)

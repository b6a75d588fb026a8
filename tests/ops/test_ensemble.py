"""Geometric self-ensemble (×8 TTA) — beyond-reference capability.

Invariants:
- dihedral_transform/inverse round-trip bit-exactly for all 8 group
  elements, on non-square batches;
- the 8 transforms are pairwise distinct (the group acts faithfully);
- self_ensemble equals the mean of the 8 individually-inverted outputs
  (the batched two-shape-group execution is an exact reorganization);
- for a predictor that commutes with the dihedral group (separable
  equal-scale resize), the ensemble equals the plain output;
- the wrapped predictor composes with the overlap-tiled path.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from simplesr_tpu.ops import (
    dihedral_transform,
    dihedral_inverse,
    self_ensemble,
    ensemble_predictor,
    resize,
    tiled_apply,
)
from simplesr_tpu.ops.ensemble import NUM_TRANSFORMS


@pytest.mark.parametrize("k", range(NUM_TRANSFORMS))
def test_transform_inverse_roundtrip_exact(rng, k):
    x = jnp.asarray(rng.uniform(0, 1, size=(2, 5, 9, 3)).astype(np.float32))
    back = dihedral_inverse(dihedral_transform(x, k), k)
    assert back.shape == x.shape
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_transforms_pairwise_distinct(rng):
    x = jnp.asarray(rng.uniform(0, 1, size=(1, 6, 6, 1)).astype(np.float32))
    flat = [np.asarray(dihedral_transform(x, k)).ravel()
            for k in range(NUM_TRANSFORMS)]
    for i in range(NUM_TRANSFORMS):
        for j in range(i + 1, NUM_TRANSFORMS):
            assert not np.array_equal(flat[i], flat[j]), (i, j)


def test_rotation_shape_swap():
    x = jnp.zeros((1, 4, 7, 3))
    assert dihedral_transform(x, 1).shape == (1, 7, 4, 3)
    assert dihedral_transform(x, 2).shape == (1, 4, 7, 3)
    assert dihedral_transform(x, 5).shape == (1, 7, 4, 3)


def test_invalid_k_rejected():
    x = jnp.zeros((1, 4, 4, 3))
    with pytest.raises(ValueError):
        dihedral_transform(x, 8)
    with pytest.raises(ValueError):
        dihedral_inverse(x, -1)
    with pytest.raises(ValueError):
        self_ensemble(lambda t: t, x, transforms=(0, 0))


def test_matches_naive_per_transform_mean(rng):
    """The batched group execution is exactly mean_k T_k^{-1} f(T_k x) for
    a nonlinear, non-equivariant f."""
    x = jnp.asarray(rng.uniform(0, 1, size=(2, 6, 10, 3)).astype(np.float32))

    def f(t):  # upsample x2 with a deliberately asymmetric nonlinearity
        up = jnp.repeat(jnp.repeat(t, 2, axis=1), 2, axis=2)
        ramp = jnp.arange(up.shape[2], dtype=jnp.float32) / up.shape[2]
        return up * up + ramp[None, None, :, None]

    naive = np.mean(
        [np.asarray(dihedral_inverse(f(dihedral_transform(x, k)), k))
         for k in range(NUM_TRANSFORMS)], axis=0)
    fused = np.asarray(self_ensemble(f, x))
    np.testing.assert_allclose(fused, naive, atol=1e-6)


def test_equivariant_predictor_is_fixed_point(rng):
    """Equal-scale separable resize commutes with rotations/flips, so the
    ensemble of it must equal the plain prediction (up to averaging
    noise)."""
    x = jnp.asarray(rng.uniform(0, 1, size=(1, 8, 8, 3)).astype(np.float32))

    def predict(t):
        return resize(t, (t.shape[1] * 2, t.shape[2] * 2), method="bicubic")

    plain = np.asarray(predict(x))
    ens = np.asarray(self_ensemble(predict, x))
    np.testing.assert_allclose(ens, plain, atol=1e-5)


def test_subset_transforms(rng):
    """A flip-only ensemble uses exactly the requested elements."""
    x = jnp.asarray(rng.uniform(0, 1, size=(1, 4, 6, 3)).astype(np.float32))
    f = lambda t: t * t
    got = np.asarray(self_ensemble(f, x, transforms=(0, 4)))
    want = np.mean([np.asarray(dihedral_inverse(f(dihedral_transform(x, k)), k))
                    for k in (0, 4)], axis=0)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_composes_with_tiled_apply(rng):
    """ensemble_predictor drops into tiled_apply: on square tiles the
    ensemble of an equivariant predictor reduces to the plain predictor,
    so the two tiled outputs must agree (tiling itself is unchanged)."""
    img = jnp.asarray(rng.uniform(0, 1, size=(40, 52, 3)).astype(np.float32))

    def predict(t):
        return resize(t, (t.shape[1] * 2, t.shape[2] * 2), method="bicubic")

    wrapped = ensemble_predictor(predict)
    tiled_ens = np.asarray(tiled_apply(wrapped, img, (16, 16), overlap=4,
                                       scale=2, batch_size=4))
    tiled_plain = np.asarray(tiled_apply(predict, img, (16, 16), overlap=4,
                                         scale=2, batch_size=4))
    np.testing.assert_allclose(tiled_ens, tiled_plain, atol=1e-4)

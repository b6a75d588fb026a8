"""Loss parity vs TF (keras BCE/MSE/MAE semantics) and formula invariants."""

import numpy as np
import pytest
import jax.numpy as jnp

from simplesr_tpu.losses import (
    MeanSquaredError, MeanAbsoluteError, AdversarialLoss, RaAdversarialLoss,
    DiscriminatorLoss, RaDiscriminatorLoss, bce_from_probs, bce_from_logits,
    total_variation, LOSS_REGISTRY, adapt_generator_loss,
)


def _tf():
    import tensorflow as tf
    return tf


def test_mse_mae_match_tf(rng):
    tf = _tf()
    hr = rng.uniform(-1, 1, size=(4, 16, 16, 3)).astype(np.float32)
    sr = rng.uniform(-1, 1, size=(4, 16, 16, 3)).astype(np.float32)
    loss, metrics = MeanSquaredError()(hr, sr, None, None)
    assert float(loss) == pytest.approx(
        float(tf.keras.losses.MeanSquaredError()(hr, sr)), rel=1e-5)
    assert "mean_squared_error" in metrics
    loss, _ = MeanAbsoluteError()(hr, sr, None, None)
    assert float(loss) == pytest.approx(
        float(tf.keras.losses.MeanAbsoluteError()(hr, sr)), rel=1e-5)


def test_weighted_gating_matches_reference(rng):
    """loss_weight only applies when weighted=True (reference
    mean_squared_error.py:26-34)."""
    hr = rng.uniform(size=(2, 8, 8, 3)).astype(np.float32)
    sr = rng.uniform(size=(2, 8, 8, 3)).astype(np.float32)
    unweighted, m1 = MeanSquaredError(weighted=False, loss_weight=0.5)(hr, sr, None, None)
    weighted, m2 = MeanSquaredError(weighted=True, loss_weight=0.5)(hr, sr, None, None)
    assert float(weighted) == pytest.approx(float(unweighted) * 0.5, rel=1e-6)
    assert "weighted_mean_squared_error" in m2 and "weighted_mean_squared_error" not in m1


def test_bce_matches_tf(rng):
    tf = _tf()
    probs = rng.uniform(0.01, 0.99, size=(8, 1)).astype(np.float32)
    labels = (rng.uniform(size=(8, 1)) > 0.5).astype(np.float32)
    assert float(bce_from_probs(labels, probs)) == pytest.approx(
        float(tf.keras.losses.BinaryCrossentropy()(labels, probs)), rel=1e-4)
    logits = rng.normal(0, 3, size=(8, 1)).astype(np.float32)
    assert float(bce_from_logits(labels, logits)) == pytest.approx(
        float(tf.keras.losses.BinaryCrossentropy(from_logits=True)(labels, logits)), rel=1e-4)


def test_adversarial_loss_formula(rng):
    sr_critic = rng.uniform(0.1, 0.9, size=(6, 1)).astype(np.float32)
    loss, _ = AdversarialLoss()(None, None, None, sr_critic)
    expected = -np.mean(np.log(sr_critic))
    assert float(loss) == pytest.approx(expected, rel=1e-4)


def test_ra_adversarial_is_symmetric_at_equal_critics():
    """When every critic output is the same constant, both relativistic
    logits are 0 → loss = BCE at logit 0 = log(2)."""
    c = np.full((5, 1), 1.7, np.float32)
    loss, _ = RaAdversarialLoss()(None, None, c, c)
    assert float(loss) == pytest.approx(np.log(2.0), rel=1e-5)

    # And the general formula on distinct values.
    hr_c = np.array([[0.3], [2.0]], np.float32)
    sr_c = np.array([[-1.0], [0.5]], np.float32)
    loss, _ = RaAdversarialLoss()(None, None, hr_c, sr_c)
    real = float(bce_from_logits(np.zeros_like(hr_c), hr_c - sr_c.mean()))
    fake = float(bce_from_logits(np.ones_like(sr_c), sr_c - hr_c.mean()))
    assert float(loss) == pytest.approx((real + fake) / 2, rel=1e-5)


def test_discriminator_loss_with_smoothed_labels(rng):
    tf = _tf()
    sr_c = rng.uniform(0.1, 0.9, size=(4, 1)).astype(np.float32)
    hr_c = rng.uniform(0.1, 0.9, size=(4, 1)).astype(np.float32)
    sr_l = np.full((4, 1), 0.1, np.float32)
    hr_l = np.full((4, 1), 0.9, np.float32)
    loss, _ = DiscriminatorLoss()(sr_c, hr_c, sr_l, hr_l)
    bce = tf.keras.losses.BinaryCrossentropy()
    expected = float(bce(sr_l, sr_c)) + float(bce(hr_l, hr_c))
    assert float(loss) == pytest.approx(expected, rel=1e-4)


def test_ra_discriminator_loss(rng):
    sr_c = rng.normal(size=(4, 1)).astype(np.float32)
    hr_c = rng.normal(size=(4, 1)).astype(np.float32)
    sr_l = np.zeros((4, 1), np.float32)
    hr_l = np.ones((4, 1), np.float32)
    loss, _ = RaDiscriminatorLoss()(sr_c, hr_c, sr_l, hr_l)
    real = float(bce_from_logits(hr_l, hr_c - sr_c.mean()))
    fake = float(bce_from_logits(sr_l, sr_c - hr_c.mean()))
    assert float(loss) == pytest.approx((real + fake) / 2, rel=1e-5)


def test_total_variation_matches_tf(rng):
    tf = _tf()
    imgs = rng.uniform(size=(3, 12, 12, 3)).astype(np.float32)
    ours = float(total_variation(jnp.asarray(imgs)))
    theirs = float(tf.reduce_sum(tf.image.total_variation(tf.convert_to_tensor(imgs))))
    assert ours == pytest.approx(theirs, rel=1e-4)


def test_registry_complete():
    for name in ["MeanSquaredError", "MeanAbsoluteError", "VGGLoss",
                 "AdversarialLoss", "RaAdversarialLoss", "DiscriminatorLoss",
                 "RaDiscriminatorLoss"]:
        assert name in LOSS_REGISTRY


def test_custom_lambda_loss_adapts(rng):
    """Reference tests/models/test_generator.py:10-27 — user lambdas compose."""
    fn = adapt_generator_loss(lambda hr, sr, hc, sc: jnp.mean(jnp.abs(hr - sr)))
    hr = jnp.ones((2, 4, 4, 3))
    sr = jnp.zeros((2, 4, 4, 3))
    loss, metrics = fn(hr, sr, None, None)
    assert float(loss) == pytest.approx(1.0)
    assert metrics

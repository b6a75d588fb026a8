"""Adversarial losses: standard (SRGAN) and relativistic-average (ESRGAN).

Parity with reference loss_functions/:
  * AdversarialLoss (adversarial_loss.py:40-66): BCE(1, D(sr)) on
    probabilities (the standard critic ends in sigmoid).
  * RaAdversarialLoss (ra_adversarial_loss.py:42-78): from-logits
    [BCE(0, D(hr)−mean D(sr)) + BCE(1, D(sr)−mean D(hr))] / 2.
  * DiscriminatorLoss (discriminator_loss.py:43-68):
    BCE(sr_labels, D(sr)) + BCE(hr_labels, D(hr)) — labels may be smoothed.
  * RaDiscriminatorLoss (ra_discriminator_loss.py:42-74): from-logits mirror
    with caller-supplied labels, averaged over the two terms.
"""

import jax.numpy as jnp

from simplesr_tpu.losses.base import Loss, bce_from_probs, bce_from_logits


class AdversarialLoss(Loss):
    """Generator non-saturating loss for the standard GAN."""

    name = "adversarial_loss"

    def __call__(self, hr_batch, sr_batch, hr_critic, sr_critic):
        loss = bce_from_probs(jnp.ones_like(sr_critic), sr_critic)
        return self._package(loss)


class RaAdversarialLoss(Loss):
    """Generator relativistic-average loss (logits in, ESRGAN)."""

    name = "ra_adversarial_loss"

    def __call__(self, hr_batch, sr_batch, hr_critic, sr_critic):
        real = bce_from_logits(jnp.zeros_like(hr_critic),
                               hr_critic - jnp.mean(sr_critic))
        fake = bce_from_logits(jnp.ones_like(sr_critic),
                               sr_critic - jnp.mean(hr_critic))
        loss = (real + fake) / 2.0
        return self._package(loss)


class DiscriminatorLoss(Loss):
    """Standard discriminator loss (probabilities in)."""

    name = "discriminator_loss"

    def __call__(self, sr_critic, hr_critic, sr_labels, hr_labels):
        fake = bce_from_probs(sr_labels, sr_critic)
        real = bce_from_probs(hr_labels, hr_critic)
        loss = real + fake
        return self._package(loss)


class RaDiscriminatorLoss(Loss):
    """Relativistic-average discriminator loss (logits in)."""

    name = "ra_discriminator_loss"

    def __call__(self, sr_critic, hr_critic, sr_labels, hr_labels):
        real = bce_from_logits(hr_labels, hr_critic - jnp.mean(sr_critic))
        fake = bce_from_logits(sr_labels, sr_critic - jnp.mean(hr_critic))
        loss = (real + fake) / 2.0
        return self._package(loss)

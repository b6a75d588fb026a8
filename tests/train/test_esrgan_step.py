"""The full ESRGAN-style fused step (tiny RRDB generator + relativistic
critic + Ra losses + label-free logits) trains and stays finite."""

import numpy as np
import jax.numpy as jnp

from simplesr_tpu.train import Generator, Discriminator, SRModel
from simplesr_tpu.losses import MeanAbsoluteError, RaAdversarialLoss


def test_relativistic_gan_step(tmp_path, rng):
    class Cfg:
        model_dir = str(tmp_path / "models")
        checkpoint_dir = str(tmp_path / "ckpt")
        early_stop_metric = "psnr"
        early_stop_patience = 100
        epoch_train_summary_writer = None
        batch_train_summary_writer = None
        epoch_validation_summary_writer = None
        batch_validation_summary_writer = None

    gen = Generator(
        upsample_factor=2, architecture="rrdb",
        loss_functions=[MeanAbsoluteError(weighted=True, loss_weight=1e-2),
                        RaAdversarialLoss(weighted=True, loss_weight=5e-3)],
        num_blocks=1, num_dense_blocks=2, num_convs=2, num_filters=8,
        dtype=jnp.float32, input_dims=(8, 8))
    disc = Discriminator.initialize_relativistic(
        num_filters=8, input_dims=(16, 16), dtype=jnp.float32)
    model = SRModel(model_type="gan", generator=gen,
                    generator_optimizer="Adam",
                    generator_optimizer_config={"learning_rate": 1e-3},
                    discriminator=disc, discriminator_optimizer="Adam",
                    discriminator_optimizer_config={"learning_rate": 1e-3},
                    config=Cfg)

    lr = rng.uniform(0, 1, size=(2, 8, 8, 3)).astype(np.float32)
    hr = rng.uniform(-1, 1, size=(2, 16, 16, 3)).astype(np.float32)
    model.before_epoch()
    for _ in range(3):
        model.train_step(lr, hr)
        model.after_train_batch()
    model.validation_step(lr, hr)
    model.after_validation_batch()

    g = model.generator_wrapper().epoch_metrics(True).results()
    d = model.discriminator_wrapper().epoch_metrics(True).results()
    assert "ra_adversarial_loss" in g and "weighted_ra_adversarial_loss" in g
    assert "ra_discriminator_loss" in d
    assert all(np.isfinite(v) for v in list(g.values()) + list(d.values()))
    # relativistic critic emits raw logits — accuracies still computed
    assert "discriminator_accuracy" in d

"""SRModel state-machine tests, mirroring reference tests/models/test_srmodel.py:
checkpoint round-trips, warm starting, metric semantics — plus real train
steps (loss decreases) in both resnet and GAN modes."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from simplesr_tpu.train import Generator, Discriminator, SRModel
from simplesr_tpu.losses import MeanSquaredError


def _tiny_generator(scale=2, batch_norm=True):
    return Generator.srresnet(upsample_factor=scale, num_blocks=1,
                              num_filters=8, batch_norm=batch_norm,
                              dtype=jnp.float32, input_dims=(16, 16))


def _tiny_gan(tmp_path):
    gen = Generator.srgan_generator(
        upsample_factor=2, vgg_loss=False, adversarial_loss_weight=1e-3,
        num_blocks=1, num_filters=8, dtype=jnp.float32, input_dims=(16, 16))
    disc = Discriminator.initialize_standard(
        label_smoothing=True, smoothing_offset=0.2, num_filters=8,
        input_dims=(32, 32), dtype=jnp.float32)
    return SRModel(model_type="gan", generator=gen,
                   generator_optimizer="Adam",
                   generator_optimizer_config={"learning_rate": 1e-3},
                   discriminator=disc, discriminator_optimizer="Adam",
                   discriminator_optimizer_config={"learning_rate": 1e-3},
                   config=_cfg(tmp_path))


def _cfg(tmp_path):
    class Cfg:
        model_dir = str(tmp_path / "models")
        checkpoint_dir = str(tmp_path / "checkpoints")
        early_stop_metric = "psnr"
        early_stop_patience = 100
        epoch_train_summary_writer = None
        batch_train_summary_writer = None
        epoch_validation_summary_writer = None
        batch_validation_summary_writer = None
    return Cfg


def _batch(rng, n=2, hw=16, scale=2):
    lr = rng.uniform(0, 1, size=(n, hw, hw, 3)).astype(np.float32)
    hr = rng.uniform(-1, 1, size=(n, hw * scale, hw * scale, 3)).astype(np.float32)
    return lr, hr


def test_validation_errors():
    gen = _tiny_generator()
    with pytest.raises(ValueError):
        SRModel(model_type="bogus", generator=gen)
    with pytest.raises(ValueError):
        SRModel(model_type="resnet", generator=None)
    with pytest.raises(ValueError):
        SRModel(model_type="gan", generator=gen, generator_optimizer="Adam")


def test_resnet_training_reduces_loss(rng, tmp_path):
    model = SRModel(model_type="resnet", generator=_tiny_generator(),
                    generator_optimizer="Adam",
                    generator_optimizer_config={"learning_rate": 1e-2},
                    config=_cfg(tmp_path))
    lr, hr = _batch(rng)
    model.before_epoch()
    losses = []
    for _ in range(12):
        model.train_step(lr, hr)
        losses.append(model.generator_wrapper().batch_metrics()["generator_loss"].result())
        model.after_train_batch()
    assert losses[-1] < losses[0]
    assert model.iterations() == 12
    assert np.isfinite(losses).all()


def test_gan_one_epoch_runs(rng, tmp_path):
    model = _tiny_gan(tmp_path)
    lr, hr = _batch(rng)
    model.before_epoch()
    for _ in range(2):
        model.train_step(lr, hr)
        model.after_train_batch()
    model.validation_step(lr, hr)
    model.after_validation_batch()
    model.after_epoch()
    hist = model.histories()
    assert "psnr" in hist["train_epoch"]
    assert "discriminator_loss" in hist["train_epoch"]
    assert "discriminator_accuracy" in hist["train_epoch"]
    assert "adversarial_loss" in hist["train_epoch"]
    # checkpoint was written (first epoch is always a new best)
    step, mgr = model.latest_checkpoint()
    assert step is not None


def test_checkpoint_roundtrip(rng, tmp_path):
    """Reference test_srmodel.py:20-51 — save, mutate, restore must recover
    saved params exactly."""
    model = SRModel(model_type="resnet", generator=_tiny_generator(),
                    generator_optimizer="Adam",
                    generator_optimizer_config={"learning_rate": 1e-2},
                    config=_cfg(tmp_path))
    lr, hr = _batch(rng)
    model.before_epoch()
    model.train_step(lr, hr)
    model.after_train_batch()
    model.validation_step(lr, hr)
    model.after_validation_batch()
    model.after_epoch()  # saves checkpoint (new best)

    saved = jax.device_get(model.state.g_params)
    # mutate by training more
    for _ in range(3):
        model.train_step(lr, hr)
    mutated = jax.device_get(model.state.g_params)
    diff = jax.tree_util.tree_map(lambda a, b: np.abs(a - b).max(), saved, mutated)
    assert max(jax.tree_util.tree_leaves(diff)) > 0

    model._restore_latest_checkpoint()
    restored = jax.device_get(model.state.g_params)
    for a, b in zip(jax.tree_util.tree_leaves(saved),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(a, b)


def test_warm_start_from_resnet_checkpoint(rng, tmp_path):
    """Reference test_srmodel.py:53-98 — a new SRModel warm-starts from a
    previous run's checkpoint directory."""
    cfg = _cfg(tmp_path)
    model = SRModel(model_type="resnet", generator=_tiny_generator(),
                    generator_optimizer="Adam",
                    generator_optimizer_config={"learning_rate": 1e-2},
                    config=cfg)
    lr, hr = _batch(rng)
    model.before_epoch()
    model.train_step(lr, hr)
    model.after_train_batch()
    model.validation_step(lr, hr)
    model.after_validation_batch()
    model.after_epoch()
    trained = jax.device_get(model.state.g_params)
    step = int(model.state.step)

    model2 = SRModel(model_type="resnet", generator=_tiny_generator(),
                     generator_optimizer="Adam",
                     generator_optimizer_config={"learning_rate": 1e-2},
                     resnet_checkpoint=f"{cfg.checkpoint_dir}/resnet",
                     config=cfg)
    for a, b in zip(jax.tree_util.tree_leaves(trained),
                    jax.tree_util.tree_leaves(jax.device_get(model2.state.g_params))):
        np.testing.assert_array_equal(a, b)
    assert int(model2.state.step) == step


def test_save_and_reload_model(rng, tmp_path):
    model = SRModel(model_type="resnet", generator=_tiny_generator(),
                    generator_optimizer="Adam", config=_cfg(tmp_path))
    path = model.save_model(str(tmp_path / "models"), postfix="x")
    from simplesr_tpu.train import load_model
    module, variables = load_model(path)
    lr, _ = _batch(rng)
    out = module.apply(variables, jnp.asarray(lr), train=False)
    expected = model.generate(lr)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-6)


def test_custom_image_metrics(rng, tmp_path):
    """Reference test_srmodel.py:100-174 — custom lambda metrics feed the
    metric dicts."""
    calls = []

    def custom(hr, sr):
        calls.append(1)
        return jnp.mean(jnp.abs(hr - sr))

    from simplesr_tpu.ops import psnr
    model = SRModel(model_type="resnet", generator=_tiny_generator(),
                    generator_optimizer="Adam",
                    image_metrics={"psnr": psnr, "mae": custom},
                    config=_cfg(tmp_path))
    lr, hr = _batch(rng)
    model.before_epoch()
    model.train_step(lr, hr)
    combined = model._combined_batch_metrics()
    assert "mae" in combined and "psnr" in combined
    assert np.isfinite(combined["mae"])


def test_generator_weighted_metrics_present(rng, tmp_path):
    gen = Generator.srresnet(
        upsample_factor=2,
        loss_function=[MeanSquaredError(weighted=True, loss_weight=0.5)],
        num_blocks=1, num_filters=8, dtype=jnp.float32, input_dims=(16, 16))
    model = SRModel(model_type="resnet", generator=gen,
                    generator_optimizer="Adam", config=_cfg(tmp_path))
    lr, hr = _batch(rng)
    model.before_epoch()
    model.train_step(lr, hr)
    m = gen.batch_metrics().results()
    assert "weighted_mean_squared_error" in m
    assert m["weighted_mean_squared_error"] == pytest.approx(
        0.5 * m["mean_squared_error"], rel=1e-5)


def test_best_metric_tracks_running_best(rng, tmp_path):
    """state.best_metric must hold the running BEST of the tracked metric
    across epochs (reference sr_model.py:593-599 saves the checkpoint — and
    with it the metric value — only on new-best epochs); a down-epoch must
    not overwrite it with the lower value."""
    model = SRModel(model_type="resnet", generator=_tiny_generator(),
                    generator_optimizer="Adam",
                    generator_optimizer_config={"learning_rate": 1e-2},
                    config=_cfg(tmp_path))
    history = [10.0, 30.0, 20.0, 25.0]  # up, then down, then partial recovery
    for value in history:
        model.before_epoch()
        model._valid_epoch_metrics.ensure("psnr")(jnp.asarray(value))
        model.after_epoch()
        assert float(model.state.best_metric) == max(
            history[:history.index(value) + 1])
    assert float(model.state.best_metric) == 30.0


def test_warm_start_with_mismatched_optimizer(rng, tmp_path):
    """resnet_checkpoint warm start must survive the pretrain run having a
    DIFFERENT optimizer config (e.g. LR schedule) than the GAN stage: params
    restore, the new optimizer starts fresh."""
    from simplesr_tpu.train.optimizers import piecewise_constant_decay

    cfg = _cfg(tmp_path)
    pre = SRModel(model_type="resnet", generator=_tiny_generator(batch_norm=False),
                  generator_optimizer="Adam",
                  generator_optimizer_config={
                      "learning_rate": piecewise_constant_decay([5], [1e-3, 1e-4])},
                  config=cfg)
    lr, hr = _batch(rng)
    pre.before_epoch()
    pre.train_step(lr, hr)
    pre.after_train_batch()
    pre._valid_epoch_metrics.ensure("psnr")(jnp.asarray(20.0))
    pre.after_epoch()  # saves checkpoint

    import os
    ckpt = os.path.join(cfg.checkpoint_dir, "resnet")
    warm = SRModel(model_type="resnet", generator=_tiny_generator(batch_norm=False),
                   generator_optimizer="Adam",
                   generator_optimizer_config={"learning_rate": 1e-4},
                   resnet_checkpoint=ckpt, config=_cfg(tmp_path / "warm"))
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(pre.state.g_params)),
                    jax.tree_util.tree_leaves(jax.device_get(warm.state.g_params))):
        np.testing.assert_array_equal(a, b)
    assert float(warm.state.best_metric) == 20.0
    # and training proceeds from the fresh optimizer without error
    warm.before_epoch()
    warm.train_step(lr, hr)

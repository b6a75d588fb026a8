"""Unit tests for train-layer components: early stopping, optimizers/LR
schedules (reference tests/models/test_learnrate_scheduling.py), label
smoothing bounds (reference tests/models/test_discriminator.py:12-62),
custom loss composition (reference tests/models/test_generator.py)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from simplesr_tpu.train import (
    Generator, Discriminator, EarlyStopping, build_optimizer,
    piecewise_constant_decay,
)
from simplesr_tpu.losses import MeanSquaredError


# --------------------------------------------------------- early stopping

def test_early_stopping_patience():
    es = EarlyStopping("psnr", patience=2)
    hist = []
    for v in [10.0, 11.0, 10.5, 10.0, 9.5]:
        hist.append(v)
        es.evaluate_stop_criterion(hist)
    # drops after best: 10.5 (no drop vs prev best? 10.5<11 and 10.5<11 → without_improvement+1),
    # 10.0 (+1) → patience 2 reached
    assert es.stop_early()
    assert es.best_value == 11.0


def test_early_stopping_resets_on_new_best():
    es = EarlyStopping("psnr", patience=2)
    hist = []
    for v in [10.0, 9.0, 11.0, 12.0]:
        hist.append(v)
        es.evaluate_stop_criterion(hist)
    assert not es.stop_early()
    assert es.num_epochs_after_best() == 0


def test_num_epochs_after_best_gates_saves():
    es = EarlyStopping("psnr", patience=10)
    es.evaluate_stop_criterion([5.0])
    assert es.num_epochs_after_best() == 0  # save
    es.evaluate_stop_criterion([5.0, 4.0])
    assert es.num_epochs_after_best() == 1  # no save
    es.evaluate_stop_criterion([5.0, 4.0, 6.0])
    assert es.num_epochs_after_best() == 0  # save again


# ------------------------------------------------------------- optimizers

def test_piecewise_constant_decay_keras_semantics():
    sched = piecewise_constant_decay([100, 200], [1e-2, 1e-3, 1e-4])
    assert float(sched(0)) == pytest.approx(1e-2)
    assert float(sched(100)) == pytest.approx(1e-2)   # step <= boundary → first value
    assert float(sched(101)) == pytest.approx(1e-3)
    assert float(sched(200)) == pytest.approx(1e-3)
    assert float(sched(201)) == pytest.approx(1e-4)


def test_warmup_cosine_decay_schedule_spec():
    from simplesr_tpu.train.optimizers import build_schedule
    sched = build_schedule({"warmup_cosine_decay": {
        "peak_learning_rate": 1e-3, "warmup_steps": 10, "decay_steps": 100}})
    assert float(sched(0)) == pytest.approx(0.0)
    assert float(sched(5)) == pytest.approx(5e-4, rel=1e-3)   # linear warmup
    assert float(sched(10)) == pytest.approx(1e-3, rel=1e-3)  # peak
    assert float(sched(100)) == pytest.approx(0.0, abs=1e-9)  # decayed out


def test_lr_schedule_applied_during_training():
    """Reference test_learnrate_scheduling.py:20-58 — the decayed LR takes
    effect at the configured boundaries during real updates."""
    sched = piecewise_constant_decay([2], [1.0, 0.1])
    tx = build_optimizer("SGD", {"learning_rate": sched})
    params = {"w": jnp.ones(())}
    opt_state = tx.init(params)
    grads = {"w": jnp.ones(())}
    deltas = []
    for step in range(4):
        updates, opt_state = tx.update(grads, opt_state, params)
        deltas.append(float(-updates["w"]))
        params = optax.apply_updates(params, updates)
    # optax count is 0-based at first update; keras semantics step<=2 → 1.0
    assert deltas[0] == pytest.approx(1.0)
    assert deltas[2] == pytest.approx(1.0)
    assert deltas[3] == pytest.approx(0.1)


def test_build_optimizer_names():
    for name in ["Adam", "SGD", "RMSprop", "adamw"]:
        tx = build_optimizer(name, {"learning_rate": 1e-3})
        assert isinstance(tx, optax.GradientTransformation)
    with pytest.raises(ValueError):
        build_optimizer("NoSuchOpt")
    # passthrough
    tx = build_optimizer(optax.adam(1e-3))
    assert isinstance(tx, optax.GradientTransformation)


def test_keras_beta_names():
    tx = build_optimizer("Adam", {"learning_rate": 1e-3, "beta_1": 0.5,
                                  "beta_2": 0.99, "epsilon": 1e-8})
    assert isinstance(tx, optax.GradientTransformation)


# ------------------------------------------------------------ discriminator

def test_label_smoothing_bounds():
    """Reference test_discriminator.py:12-62 — smoothed labels live in
    [0, offset] (SR) and [1-offset, 1-offset+0.5] (HR) and vary randomly."""
    disc = Discriminator.initialize_standard(
        label_smoothing=True, smoothing_offset=0.3, num_filters=8,
        input_dims=(32, 32), dtype=jnp.float32)
    critic = jnp.zeros((64, 1))
    sr_l, hr_l = disc.get_labels(jax.random.key(0), critic, critic)
    sr_l, hr_l = np.asarray(sr_l), np.asarray(hr_l)
    assert (sr_l >= 0).all() and (sr_l <= 0.3).all()
    assert (hr_l >= 0.7).all() and (hr_l <= 1.2).all()
    assert sr_l.std() > 0 and hr_l.std() > 0
    # different keys → different noise
    sr_l2, _ = disc.get_labels(jax.random.key(1), critic, critic)
    assert not np.allclose(sr_l, np.asarray(sr_l2))


def test_no_smoothing_hard_labels():
    disc = Discriminator.initialize_standard(num_filters=8, input_dims=(32, 32),
                                             dtype=jnp.float32)
    critic = jnp.zeros((8, 1))
    sr_l, hr_l = disc.get_labels(jax.random.key(0), critic, critic)
    np.testing.assert_array_equal(np.asarray(sr_l), 0.0)
    np.testing.assert_array_equal(np.asarray(hr_l), 1.0)


def test_relativistic_accuracy_semantics():
    disc = Discriminator.initialize_relativistic(num_filters=8,
                                                 input_dims=(32, 32),
                                                 dtype=jnp.float32)
    sr_c = jnp.asarray([[-1.0], [2.0]])   # one right, one wrong
    hr_c = jnp.asarray([[3.0], [1.0]])    # both right
    m = disc.accuracy_metrics(sr_c, hr_c)
    assert float(m["SR_accuracy"]) == pytest.approx(0.5)
    assert float(m["HR_accuracy"]) == pytest.approx(1.0)
    assert float(m["discriminator_accuracy"]) == pytest.approx(0.75)


# --------------------------------------------------------------- generator

def test_generator_requires_losses():
    with pytest.raises(ValueError):
        Generator(upsample_factor=2, architecture="srresnet", loss_functions=None)


def test_generator_custom_lambda_loss(rng):
    """Reference tests/models/test_generator.py:10-27."""
    custom = lambda hr, sr, hc, sc: jnp.mean((hr - sr) ** 2) * 2.0
    gen = Generator(upsample_factor=2, architecture="srresnet",
                    loss_functions=[MeanSquaredError(), custom],
                    num_blocks=1, num_filters=8, dtype=jnp.float32,
                    input_dims=(8, 8))
    hr = jnp.asarray(rng.uniform(-1, 1, (2, 16, 16, 3)), jnp.float32)
    sr = jnp.asarray(rng.uniform(-1, 1, (2, 16, 16, 3)), jnp.float32)
    total, metrics = gen.calculate_loss(sr, hr, None, None)
    mse = float(jnp.mean((hr - sr) ** 2))
    assert float(total) == pytest.approx(3.0 * mse, rel=1e-5)
    assert "generator_loss" in metrics


def test_generator_duck_typed_class_loss(rng):
    """Reference tests/models/test_generator.py:29-51."""
    class MyLoss:
        name = "my_loss"
        weighted = False
        loss_weight = 1.0

        def __call__(self, hr, sr, hc, sc):
            loss = jnp.mean(jnp.abs(hr - sr))
            return loss, {self.name: loss}

    gen = Generator(upsample_factor=2, architecture="srresnet",
                    loss_functions=[MyLoss()], num_blocks=1, num_filters=8,
                    dtype=jnp.float32, input_dims=(8, 8))
    hr = jnp.asarray(rng.uniform(-1, 1, (1, 16, 16, 3)), jnp.float32)
    total, metrics = gen.calculate_loss(hr * 0, hr, None, None)
    assert "my_loss" in metrics
    assert float(total) == pytest.approx(float(jnp.mean(jnp.abs(hr))), rel=1e-5)


def test_pretrained_model_reuse():
    """Two-stage pipeline: GAN generator reuses a pretrained Generator's
    module+params (reference example_without_yaml.py:315-326)."""
    pre = Generator.srresnet(upsample_factor=2, num_blocks=1, num_filters=8,
                             dtype=jnp.float32, input_dims=(8, 8))
    gan_gen = Generator.srgan_generator(upsample_factor=2, vgg_loss=False,
                                        pretrained_model=pre)
    assert gan_gen.model() is pre.model()
    a = jax.tree_util.tree_leaves(pre.variables)
    b = jax.tree_util.tree_leaves(gan_gen.variables)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

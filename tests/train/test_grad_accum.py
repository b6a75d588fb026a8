"""Gradient accumulation (SRModel grad_accum_steps / YAML
general.grad_accum_steps): k micro-batches → one averaged optimizer update.

Pins the semantics that make the knob trustworthy: exact equivalence with a
single full-batch step (mean losses ⇒ mean of micro-grads = full-batch
grad), params frozen between macro boundaries, EMA advancing per *update*
not per micro-step, non-finite micro-gradients dropped before they can
poison the accumulator, and the config threading.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from simplesr_tpu.train import Generator, SRModel


class _Cfg:
    model_dir = None
    checkpoint_dir = None
    early_stop_metric = "psnr"
    early_stop_patience = 10**6
    epoch_train_summary_writer = None
    batch_train_summary_writer = None
    epoch_validation_summary_writer = None
    batch_validation_summary_writer = None


def _model(tmp_path, accum=None, ema_decay=None):
    gen = Generator.srresnet(upsample_factor=2, num_blocks=1, num_filters=8,
                             batch_norm=False, input_dims=(8, 8),
                             dtype=jnp.float32)
    cfg = _Cfg()
    cfg.model_dir = str(tmp_path / "m")
    cfg.checkpoint_dir = str(tmp_path / "c")
    return SRModel(model_type="resnet", generator=gen,
                   generator_optimizer="Adam",
                   generator_optimizer_config={"learning_rate": 1e-3},
                   config=cfg, grad_accum_steps=accum, ema_decay=ema_decay)


def _data(n, seed=0):
    rng = np.random.default_rng(seed)
    lr = jnp.asarray(rng.uniform(0, 1, (n, 8, 8, 3)), jnp.float32)
    hr = jnp.asarray(rng.uniform(-1, 1, (n, 16, 16, 3)), jnp.float32)
    return lr, hr


def _params(model):
    return jax.device_get(model.state.g_params)


def test_two_micro_steps_equal_one_full_batch_step(tmp_path):
    lr, hr = _data(8)
    accum = _model(tmp_path / "a", accum=2)
    full = _model(tmp_path / "b")
    # same seed → identical init (precondition for the equivalence claim)
    jax.tree_util.tree_map(np.testing.assert_array_equal,
                           _params(accum), _params(full))

    accum.before_epoch()
    accum.train_step(lr[:4], hr[:4])
    accum.train_step(lr[4:], hr[4:])
    full.before_epoch()
    full.train_step(lr, hr)

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7),
        _params(accum), _params(full))


def test_params_frozen_between_macro_boundaries(tmp_path):
    lr, hr = _data(4)
    model = _model(tmp_path, accum=3)
    p0 = _params(model)
    model.before_epoch()
    model.train_step(lr, hr)
    jax.tree_util.tree_map(np.testing.assert_array_equal, p0, _params(model))
    model.train_step(lr, hr)
    jax.tree_util.tree_map(np.testing.assert_array_equal, p0, _params(model))
    model.train_step(lr, hr)  # third micro-step applies the macro update
    flat0 = jax.tree_util.tree_leaves(p0)
    flat1 = jax.tree_util.tree_leaves(_params(model))
    assert any(not np.array_equal(a, b) for a, b in zip(flat0, flat1))


def test_ema_advances_per_update_not_per_micro_step(tmp_path):
    lr, hr = _data(4)
    model = _model(tmp_path, accum=2, ema_decay=0.5)
    ema0 = jax.device_get(model.state.g_ema_params)
    model.before_epoch()
    model.train_step(lr, hr)
    # micro-step: no macro update, shadow must not move
    jax.tree_util.tree_map(np.testing.assert_array_equal,
                           ema0, jax.device_get(model.state.g_ema_params))
    model.train_step(lr, hr)
    # macro boundary: shadow = d*shadow + (1-d)*new_params exactly
    expected = jax.tree_util.tree_map(
        lambda e, p: 0.5 * e + 0.5 * p, ema0, _params(model))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-8),
        expected, jax.device_get(model.state.g_ema_params))


def test_ema_ignores_rejected_micro_step_at_macro_boundary(tmp_path):
    """Regression (r3 code review): right after a macro boundary mini_step
    is 0; a NaN micro-batch there is rejected by apply_if_finite (params
    unchanged, MultiSteps untouched) — the EMA gate must read 'no update'
    from the unchanged gradient_step, not 'update' from mini_step == 0."""
    lr, hr = _data(4)
    model = _model(tmp_path, accum=2, ema_decay=0.5)
    model.before_epoch()
    model.train_step(lr, hr)
    model.train_step(lr, hr)  # macro update applied; mini_step wraps to 0
    ema1 = jax.device_get(model.state.g_ema_params)
    model.train_step(lr, jnp.full_like(hr, jnp.nan))  # rejected at boundary
    jax.tree_util.tree_map(np.testing.assert_array_equal,
                           ema1, jax.device_get(model.state.g_ema_params))


def test_nonfinite_micro_step_is_dropped_and_training_recovers(tmp_path):
    # apply_if_finite wraps OUTSIDE MultiSteps: the NaN micro-batch is
    # screened before the accumulator (whose multiply-reset would keep a
    # NaN forever), and does not advance the accumulation counter — the
    # macro update waits for the next finite micro-batch.
    lr, hr = _data(4)
    model = _model(tmp_path, accum=2)
    p0 = _params(model)
    model.before_epoch()
    model.train_step(lr, jnp.full_like(hr, jnp.nan))  # dropped, mini stays 0
    model.train_step(lr, hr)                          # mini 0 -> 1
    jax.tree_util.tree_map(np.testing.assert_array_equal, p0, _params(model))
    # the next finite micro-batch completes the macro update; training moves
    model.train_step(lr, hr)
    model.train_step(lr, hr)
    flat0 = jax.tree_util.tree_leaves(p0)
    flat1 = jax.tree_util.tree_leaves(_params(model))
    assert any(not np.array_equal(a, b) for a, b in zip(flat0, flat1))


def test_validates_and_threads_through_config(tmp_path):
    with pytest.raises(ValueError):
        _model(tmp_path, accum=0)

    from simplesr_tpu.config import ConfigUtil
    conf = ConfigUtil.training_config(
        train_data_paths="/root/reference/tests/data/patterns/random_noise",
        num_epochs=1, batch_size=4, scale=2, crop_size=(16, 16, 3),
        num_crops=2, results_save_path=str(tmp_path / "r"),
        create_save_dirs=False, grad_accum_steps=4)
    gen = Generator.srresnet(upsample_factor=2, num_blocks=1, num_filters=8,
                             batch_norm=False, input_dims=(8, 8))
    model = SRModel.init(conf, gen, "Adam", {"learning_rate": 1e-3})
    assert model._grad_accum == 4

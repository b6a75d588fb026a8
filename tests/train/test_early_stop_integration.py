"""Early-stopping wiring through SRModel.after_epoch: checkpoint saved on
best, stop triggered after patience exhausted, best checkpoint restored
(reference sr_model.py:563-599 semantics)."""

import numpy as np
import jax
import jax.numpy as jnp

from simplesr_tpu.train import Generator, SRModel


def _model(tmp_path, patience=2):
    class Cfg:
        model_dir = str(tmp_path / "models")
        checkpoint_dir = str(tmp_path / "checkpoints")
        early_stop_metric = "psnr"
        early_stop_patience = patience
        epoch_train_summary_writer = None
        batch_train_summary_writer = None
        epoch_validation_summary_writer = None
        batch_validation_summary_writer = None
    gen = Generator.srresnet(upsample_factor=2, num_blocks=1, num_filters=8,
                             dtype=jnp.float32, input_dims=(8, 8))
    return SRModel(model_type="resnet", generator=gen,
                   generator_optimizer="Adam",
                   generator_optimizer_config={"learning_rate": 1e-2},
                   early_stop_metric="psnr", early_stop_patience=patience,
                   config=Cfg)


def _run_epoch(model, rng, val_psnr):
    """One epoch with a controlled validation psnr value."""
    lr = rng.uniform(0, 1, size=(2, 8, 8, 3)).astype(np.float32)
    hr = rng.uniform(-1, 1, size=(2, 16, 16, 3)).astype(np.float32)
    model.before_epoch()
    model.train_step(lr, hr)
    model.after_train_batch()
    # inject the validation metric the early stopper will see
    model._valid_epoch_metrics.ensure("psnr")(val_psnr)
    model.after_epoch()


def test_early_stop_restores_best(tmp_path, rng):
    model = _model(tmp_path, patience=2)

    _run_epoch(model, rng, 20.0)   # best → checkpoint
    best_step = int(model.state.step)
    best_params = jax.device_get(model.state.g_params)

    _run_epoch(model, rng, 18.0)   # worse (drop 1)
    assert not model.stop_early()
    _run_epoch(model, rng, 16.0)   # worse (drop 2) → patience reached
    assert model.stop_early()
    # best checkpoint restored on trigger (reference :581-591)
    assert int(model.state.step) == best_step
    for a, b in zip(jax.tree_util.tree_leaves(best_params),
                    jax.tree_util.tree_leaves(jax.device_get(model.state.g_params))):
        np.testing.assert_array_equal(a, b)


def test_checkpoint_only_on_new_best(tmp_path, rng):
    model = _model(tmp_path, patience=50)
    _run_epoch(model, rng, 20.0)
    step_a, _ = model.latest_checkpoint()
    _run_epoch(model, rng, 19.0)   # not a best → no new checkpoint
    step_b, _ = model.latest_checkpoint()
    assert step_b == step_a
    _run_epoch(model, rng, 21.0)   # new best → checkpoint advances
    step_c, _ = model.latest_checkpoint()
    assert step_c > step_a

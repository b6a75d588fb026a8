"""SRModel.resume(): full-state restart from the run's latest checkpoint
(closes the reference's open 'load GAN checkpoint' TODO)."""

import numpy as np
import jax
import jax.numpy as jnp

from simplesr_tpu.train import Generator, SRModel


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


def _model(tmp_path):
    gen = Generator.srresnet(upsample_factor=2, num_blocks=1, num_filters=8,
                             dtype=jnp.float32, input_dims=(8, 8), seed=0)
    return SRModel(model_type="resnet", generator=gen,
                   generator_optimizer="Adam",
                   generator_optimizer_config={"learning_rate": 1e-2},
                   config=_cfg(tmp_path))


def test_resume_restores_full_state(tmp_path, rng):
    lr = rng.uniform(0, 1, size=(2, 8, 8, 3)).astype(np.float32)
    hr = rng.uniform(-1, 1, size=(2, 16, 16, 3)).astype(np.float32)

    m1 = _model(tmp_path)
    m1.before_epoch()
    m1.train_step(lr, hr)
    m1.after_train_batch()
    m1.validation_step(lr, hr)
    m1.after_validation_batch()
    m1.after_epoch()  # writes checkpoint
    step1 = int(m1.state.step)
    params1 = jax.device_get(m1.state.g_params)

    # a fresh SRModel over the same checkpoint dir picks the run back up
    m2 = _model(tmp_path)
    assert m2.resume() == step1
    assert int(m2.state.step) == step1
    assert m2.iterations() == step1
    for a, b in zip(jax.tree_util.tree_leaves(params1),
                    jax.tree_util.tree_leaves(jax.device_get(m2.state.g_params))):
        np.testing.assert_array_equal(a, b)
    # training continues from the restored state
    m2.train_step(lr, hr)
    assert int(m2.state.step) == step1 + 1


def test_resume_without_checkpoint_returns_none(tmp_path):
    m = _model(tmp_path)
    assert m.resume() is None

"""Divergence guard: non-finite gradients must not poison parameters
(the reference's RRDB collapse failure mode, its README:97-106)."""

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


def test_nonfinite_batch_skipped(tmp_path, rng):
    gen = Generator.srresnet(upsample_factor=2, num_blocks=1, num_filters=8,
                             dtype=jnp.float32, input_dims=(8, 8))
    model = SRModel(model_type="resnet", generator=gen,
                    generator_optimizer="Adam",
                    generator_optimizer_config={"learning_rate": 1e-2},
                    config=_cfg(tmp_path))
    lr = rng.uniform(0, 1, size=(2, 8, 8, 3)).astype(np.float32)
    hr = rng.uniform(-1, 1, size=(2, 16, 16, 3)).astype(np.float32)
    model.before_epoch()
    model.train_step(lr, hr)
    before = jax.device_get(model.state.g_params)

    bad_hr = hr.copy()
    bad_hr[0, 0, 0, 0] = np.nan
    model.train_step(lr, bad_hr)  # gradients are NaN → update must be dropped
    after = jax.device_get(model.state.g_params)
    for a, b in zip(jax.tree_util.tree_leaves(before),
                    jax.tree_util.tree_leaves(after)):
        np.testing.assert_array_equal(a, b)
    assert all(np.isfinite(x).all() for x in jax.tree_util.tree_leaves(after))

    # training continues normally afterwards
    model.train_step(lr, hr)
    resumed = jax.device_get(model.state.g_params)
    diff = max(np.abs(a - b).max() for a, b in zip(
        jax.tree_util.tree_leaves(after), jax.tree_util.tree_leaves(resumed)))
    assert diff > 0

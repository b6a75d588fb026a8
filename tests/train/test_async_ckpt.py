"""Async Orbax checkpointing (default): the keep-5 save returns before the
write is durable, and every read path (resume/restore/latest) waits first —
so an immediate resume after an async save must see the full state."""

import numpy as np
import jax
import jax.numpy as jnp

from simplesr_tpu.train import Generator, SRModel


def _gen():
    return Generator.srresnet(upsample_factor=2, num_blocks=1, num_filters=8,
                              batch_norm=False, dtype=jnp.float32,
                              input_dims=(16, 16))


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


def _run_epoch(model, rng):
    lr = rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32)
    hr = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    model.before_epoch()
    model.train_step(lr, hr)
    model.after_train_batch()
    model.validation_step(lr, hr)
    model.after_validation_batch()
    model.after_epoch()


def _params(model):
    return [np.asarray(x) for x in
            jax.tree_util.tree_leaves(jax.device_get(model.state.g_params))]


def test_async_save_then_immediate_resume(rng, tmp_path):
    model = SRModel(model_type="resnet", generator=_gen(),
                    generator_optimizer="Adam",
                    generator_optimizer_config={"learning_rate": 1e-3},
                    config=_cfg(tmp_path))
    assert model._async_ckpt  # default on
    _run_epoch(model, rng)    # first epoch is always a new best → async save
    want = _params(model)

    # drift the params past the save, then resume immediately: the read
    # path must wait for the in-flight async write and restore the saved
    # state (not see a missing/partial checkpoint)
    lr = rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32)
    hr = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    model.train_step(lr, hr)
    drifted = _params(model)
    assert any(not np.array_equal(a, b) for a, b in zip(drifted, want))

    step = model.resume()
    assert step == 1
    for a, b in zip(_params(model), want):
        np.testing.assert_array_equal(a, b)

    # durability across instances: after the first manager is done, a fresh
    # model over the same checkpoint dir resumes the same state
    fresh = SRModel(model_type="resnet", generator=_gen(),
                    generator_optimizer="Adam",
                    generator_optimizer_config={"learning_rate": 1e-3},
                    config=_cfg(tmp_path))
    assert fresh.resume() == 1
    for a, b in zip(_params(fresh), want):
        np.testing.assert_array_equal(a, b)


def test_sync_mode_still_available(rng, tmp_path):
    model = SRModel(model_type="resnet", generator=_gen(),
                    generator_optimizer="Adam",
                    generator_optimizer_config={"learning_rate": 1e-3},
                    config=_cfg(tmp_path), async_checkpointing=False)
    assert not model._async_ckpt
    _run_epoch(model, rng)
    assert model.latest_checkpoint()[0] == 1


def test_config_knob_plumbs_through(tmp_path):
    from simplesr_tpu.config import ConfigUtil
    conf = ConfigUtil.training_config(
        train_data_paths=str(tmp_path), num_epochs=1, batch_size=2, scale=2,
        create_save_dirs=False, async_checkpointing=False)
    assert conf.async_checkpointing is False

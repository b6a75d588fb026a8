"""Preemption-tolerant training: SIGTERM during run_training saves a durable
resume point (last state, not best); run_training(resume=True) restores
params, optimizer, epoch counter, early-stop patience and epoch histories,
and continues from the first unfinished epoch. Beyond-reference: the
reference's resume TODO (sr_model.py:169) restarts from scratch."""

import json
import os
import signal

import numpy as np
import jax.numpy as jnp

from simplesr_tpu.data import DataPipeline
from simplesr_tpu.train import Generator, SRModel, run_training
from simplesr_tpu.train.training import _install_preemption_handler

NOISE_DIR = "/root/reference/tests/data/patterns/random_noise"


class _Cfg:
    num_epochs = 3
    scale = 2
    batch_size = 4
    early_stop_metric = "psnr"
    early_stop_patience = 100
    epoch_train_summary_writer = None
    batch_train_summary_writer = None
    epoch_validation_summary_writer = None
    batch_validation_summary_writer = None

    def __init__(self, tmp_path, num_epochs=3):
        self.num_epochs = num_epochs
        self.save_path = str(tmp_path)
        self.model_dir = str(tmp_path / "models")
        self.checkpoint_dir = str(tmp_path / "checkpoints")
        self.pic_dir = str(tmp_path / "pics")
        self.pic_dir_train = str(tmp_path / "pics" / "train")
        self.pic_dir_val = str(tmp_path / "pics" / "val")
        self.pic_dir_test = str(tmp_path / "pics" / "test")

    def __str__(self):
        return "resume test config"


def _pipeline():
    return DataPipeline(
        hr_img_path=NOISE_DIR, scale=2, train_val_split=0.25, batch_size=4,
        crop=True, crop_size=(16, 16, 3), num_crops=2, random_seed=3)


def _model(cfg):
    gen = Generator.srresnet(upsample_factor=2, num_blocks=1, num_filters=8,
                             dtype=jnp.float32, input_dims=(16, 16))
    return SRModel(model_type="resnet", generator=gen,
                   generator_optimizer="Adam",
                   generator_optimizer_config={"learning_rate": 1e-3},
                   config=cfg)


def test_sigterm_saves_resume_point_and_resume_continues(tmp_path):
    cfg = _Cfg(tmp_path, num_epochs=3)
    model = _model(cfg)
    # SIGTERM before the loop starts epoch 0's batches: the handler is
    # installed by run_training itself, so raise it from after_train_batch
    # (a real mid-epoch point) via a hook wrapper
    calls = {"n": 0}
    orig = model.after_train_batch

    def hooked():
        orig()
        calls["n"] += 1
        if calls["n"] == 1:
            signal.raise_signal(signal.SIGTERM)

    model.after_train_batch = hooked
    result = run_training(cfg, _pipeline(), model, plotting_interval=0)
    assert result is None  # preempted
    # SIGTERM handling is restored (default action) after run_training
    assert signal.getsignal(signal.SIGTERM) in (
        signal.SIG_DFL, signal.default_int_handler)

    # resume meta written with 0 completed epochs (mid-epoch preemption)
    meta_path = os.path.join(cfg.checkpoint_dir, "resnet_resume_meta.json")
    meta = json.loads(open(meta_path).read())
    assert meta["completed_epochs"] == 0
    assert meta["iterations"] == 1

    # fresh process analogue: new model instance over the same dirs
    cfg2 = _Cfg(tmp_path, num_epochs=3)
    model2 = _model(cfg2)
    result2 = run_training(cfg2, _pipeline(), model2, plotting_interval=0,
                           resume=True)
    assert result2 is not None
    hist = model2.histories()
    # all 3 epochs of history present (epoch 0 re-run after preemption)
    assert len(hist["train_epoch"]["generator_loss"]) == 3
    # iterations continued past the preempted step
    assert model2.iterations() > 1


def test_resume_at_epoch_boundary_continues_counters(tmp_path):
    cfg = _Cfg(tmp_path, num_epochs=2)
    model = _model(cfg)
    run_training(cfg, _pipeline(), model, plotting_interval=0)
    steps_after_2 = model.iterations()
    hist2 = {k: list(v) for k, v in model.histories()["train_epoch"].items()}

    # continue the SAME run for 2 more epochs in a "new process"
    cfg2 = _Cfg(tmp_path, num_epochs=4)
    model2 = _model(cfg2)
    completed = model2.resume_training()
    assert completed == 2
    assert model2.iterations() == steps_after_2
    # epoch histories restored
    assert model2.histories()["train_epoch"]["generator_loss"] == \
        hist2["generator_loss"]
    result = run_training(cfg2, _pipeline(), model2, plotting_interval=0,
                          resume=True)
    assert result is not None
    assert len(model2.histories()["train_epoch"]["generator_loss"]) == 4
    assert model2.iterations() > steps_after_2


def test_resume_restores_early_stop_state(tmp_path):
    cfg = _Cfg(tmp_path, num_epochs=2)
    model = _model(cfg)
    run_training(cfg, _pipeline(), model, plotting_interval=0)
    es = model._early_stopping_util

    model2 = _model(_Cfg(tmp_path, num_epochs=2))
    model2.resume_training()
    es2 = model2._early_stopping_util
    assert es2.state_dict() == es.state_dict()
    assert es2.best_value == es.best_value


def test_resume_with_nothing_saved_returns_none(tmp_path):
    model = _model(_Cfg(tmp_path))
    assert model.resume_training() is None


def test_resume_config_flag_flows_from_config(tmp_path):
    # run_training reads config.resume when the kwarg is omitted
    cfg = _Cfg(tmp_path, num_epochs=1)
    model = _model(cfg)
    run_training(cfg, _pipeline(), model, plotting_interval=0)

    cfg2 = _Cfg(tmp_path, num_epochs=2)
    cfg2.resume = True
    model2 = _model(cfg2)
    run_training(cfg2, _pipeline(), model2, plotting_interval=0)
    # only epoch 1 ran in the second call: 1 restored + 1 new
    assert len(model2.histories()["train_epoch"]["generator_loss"]) == 2


def test_resolve_resume_dir(tmp_path):
    from simplesr_tpu.config.config_util import ConfigUtil
    import pytest

    base = tmp_path / "training"
    run = base / "20260818-010101"
    (run / "checkpoints").mkdir(parents=True)
    os.symlink("20260818-010101", base / "latest")

    assert ConfigUtil._resolve_resume_dir(str(tmp_path), True) == \
        "20260818-010101"
    assert ConfigUtil._resolve_resume_dir(str(tmp_path), "latest") == \
        "20260818-010101"
    assert ConfigUtil._resolve_resume_dir(
        str(tmp_path), "20260818-010101") == "20260818-010101"
    assert ConfigUtil._resolve_resume_dir(str(tmp_path), str(run)) == \
        "20260818-010101"
    with pytest.raises(ValueError, match="no checkpoints"):
        (base / "empty").mkdir()
        ConfigUtil._resolve_resume_dir(str(tmp_path), "empty")
    with pytest.raises(ValueError, match="not a run under"):
        ConfigUtil._resolve_resume_dir(str(tmp_path), "/etc")


def test_handler_restores_previous_sigterm(tmp_path):
    sentinel = lambda *_: None  # noqa: E731
    prev = signal.signal(signal.SIGTERM, sentinel)
    try:
        event, restore = _install_preemption_handler()
        assert signal.getsignal(signal.SIGTERM) is not sentinel
        signal.raise_signal(signal.SIGTERM)
        assert event.is_set()
        restore()
        assert signal.getsignal(signal.SIGTERM) is sentinel
    finally:
        signal.signal(signal.SIGTERM, prev)

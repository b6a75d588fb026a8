"""Knowledge distillation (train/distill.py): spec validation, exact metric
math, gradient pull toward the teacher, file/YAML-config plumbing. No
reference counterpart (SURVEY.md §2 — beyond-reference knob)."""

import numpy as np
import pytest
import jax.numpy as jnp

from simplesr_tpu.train import Generator, SRModel, build_distiller
from simplesr_tpu.train import serialization
from simplesr_tpu.losses import MeanSquaredError


def _gen(scale=2, seed=0, num_filters=8):
    return Generator.srresnet(upsample_factor=scale, num_blocks=1,
                              num_filters=num_filters, batch_norm=False,
                              dtype=jnp.float32, input_dims=(16, 16),
                              seed=seed)


def _teacher_pair(scale=2, seed=7):
    g = _gen(scale=scale, seed=seed, num_filters=12)
    return (g.model(), g.variables), g


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


def _model(tmp_path, distill, lr=1e-3):
    return SRModel(model_type="resnet", generator=_gen(),
                   generator_optimizer="Adam",
                   generator_optimizer_config={"learning_rate": lr},
                   config=_cfg(tmp_path), distill=distill)


def _batch(rng, n=2, hw=16, scale=2):
    lr = rng.uniform(0, 1, size=(n, hw, hw, 3)).astype(np.float32)
    hr = rng.uniform(-1, 1, size=(n, hw * scale, hw * scale, 3)).astype(np.float32)
    return lr, hr


# ------------------------------------------------------------ spec handling

def test_spec_validation():
    pair, _ = _teacher_pair()
    with pytest.raises(ValueError, match="unknown distill keys"):
        build_distiller({"model": pair, "wieght": 2.0})
    with pytest.raises(ValueError, match="needs a 'model'"):
        build_distiller({"weight": 1.0})
    with pytest.raises(ValueError, match="'mae' or 'mse'"):
        build_distiller({"model": pair, "loss": "huber"})
    with pytest.raises(ValueError, match="weight must be > 0"):
        build_distiller({"model": pair, "weight": 0.0})
    with pytest.raises(ValueError, match="unsupported distill spec"):
        build_distiller(42)


def test_scale_mismatch_from_file_fails_loudly(tmp_path):
    teacher = _gen(scale=4)
    path = str(tmp_path / "teacher_x4.msgpack")
    serialization.save_model(teacher.module_config(), teacher.variables, path)
    with pytest.raises(ValueError, match="x4 .*x2"):
        build_distiller(path, student_upsample_factor=2)
    # matching scale resolves fine, bare-path spec form
    d = build_distiller(path, student_upsample_factor=4)
    assert d.weight == 1.0 and d.loss == "mae"


# ------------------------------------------------------------ exact math

def test_distill_metric_is_exact(rng, tmp_path):
    pair, teacher = _teacher_pair()
    model = _model(tmp_path, distill={"model": pair, "weight": 0.5,
                                      "loss": "mae"})
    lr, hr = _batch(rng)

    # expected penalty on the PRE-update student weights
    student_sr = np.asarray(model.generate(lr), np.float32)
    teacher_sr = np.asarray(teacher.generate(lr), np.float32)
    expected = np.mean(np.abs(student_sr - teacher_sr))

    model.before_epoch()
    model.train_step(lr, hr)
    got = model.generator_wrapper().batch_metrics()["distillation_loss"].result()
    got_w = model.generator_wrapper().batch_metrics()[
        "weighted_distillation_loss"].result()
    np.testing.assert_allclose(got, expected, rtol=1e-5)
    np.testing.assert_allclose(got_w, 0.5 * got, rtol=1e-6)

    # generator_loss includes the weighted term on top of the MSE functor
    mse = model.generator_wrapper().batch_metrics()["mean_squared_error"].result()
    total = model.generator_wrapper().batch_metrics()["generator_loss"].result()
    np.testing.assert_allclose(total, mse + 0.5 * got, rtol=1e-5)


def test_mse_distill_variant(rng, tmp_path):
    pair, teacher = _teacher_pair()
    model = _model(tmp_path, distill={"model": pair, "loss": "mse"})
    lr, hr = _batch(rng)
    student_sr = np.asarray(model.generate(lr), np.float32)
    teacher_sr = np.asarray(teacher.generate(lr), np.float32)
    expected = np.mean((student_sr - teacher_sr) ** 2)
    model.before_epoch()
    model.train_step(lr, hr)
    got = model.generator_wrapper().batch_metrics()["distillation_loss"].result()
    np.testing.assert_allclose(got, expected, rtol=1e-5)


# ------------------------------------------------------------ training pull

def test_student_moves_toward_teacher(rng, tmp_path):
    pair, _ = _teacher_pair()
    model = _model(tmp_path, distill={"model": pair, "weight": 5.0}, lr=1e-2)
    lr, hr = _batch(rng)
    model.before_epoch()
    gaps = []
    for _ in range(15):
        model.train_step(lr, hr)
        gaps.append(model.generator_wrapper()
                    .batch_metrics()["distillation_loss"].result())
        model.after_train_batch()
    assert gaps[-1] < gaps[0]
    assert np.isfinite(gaps).all()


# ------------------------------------------------------------ plumbing

def test_config_and_validation_plumbing(rng, tmp_path):
    # teacher saved as a whole-model file, wired through ConfigUtil-style
    # config attrs into SRModel.init, reported by the validation step too
    teacher = _gen(seed=3)
    path = str(tmp_path / "teacher.msgpack")
    serialization.save_model(teacher.module_config(), teacher.variables, path)

    cfg = _cfg(tmp_path)
    cfg.distill = {"model": path, "weight": 0.25}
    cfg.ema_decay = None
    cfg.ema_eval = False
    cfg.grad_accum_steps = None
    cfg.fsdp = False
    cfg.data_parallel = False
    model = SRModel.init(cfg, _gen(), "Adam", {"learning_rate": 1e-3})
    assert model._distill is not None and model._distill.weight == 0.25

    lr, hr = _batch(rng)
    model.before_epoch()
    model.validation_step(lr, hr)
    val = model.generator_wrapper().epoch_metrics(train=False).results()
    assert "distillation_loss" in val and np.isfinite(val["distillation_loss"])


def test_training_config_carries_distill(tmp_path):
    from simplesr_tpu.config import ConfigUtil
    conf = ConfigUtil.training_config(
        train_data_paths=str(tmp_path), num_epochs=1, batch_size=2, scale=2,
        create_save_dirs=False, distill={"model": "t.msgpack", "weight": 2.0})
    assert conf.distill == {"model": "t.msgpack", "weight": 2.0}

"""Config hydration tests, mirroring reference tests/config/test_config_util.py:
full YAML→Config/Pipeline/Model round-trip (paths, augmentation validation,
loss-functor params, optimizer hyperparams)."""

import numpy as np
import pytest
import jax.numpy as jnp

from simplesr_tpu.config import ConfigUtil, Experiment, yaml_helper

NOISE_DIR = "/root/reference/tests/data/patterns/random_noise"
GRAD_DIR = "/root/reference/tests/data/patterns/gradients"


def _training_yaml(tmp_path, gan=False):
    conf = {
        "general": {
            "operation": "training",
            "train_data_paths": NOISE_DIR,
            "results_save_path": str(tmp_path / "results"),
            "num_epochs": 1,
            "batch_size": 4,
            "scale": 2,
            "train_val_split": 0.25,
            "crop_imgs": True,
            "crop_size": (16, 16, 3),
            "num_crops": 2,
            "random_seed": 5,
            "augmentations": ["flip_along_x", "rotate90"],
        },
        "model": {
            "generator": {
                "upsample_factor": 2,
                "architecture": "srresnet",
                "num_blocks": 1,
                "num_filters": 8,
                "input_dims": (16, 16),
                "dtype": jnp.float32,
                "loss_functions": [
                    {"loss_function": "MeanSquaredError",
                     "weighted": True, "loss_weight": 0.5},
                ],
            },
            "generator_optimizer": "Adam",
            "generator_optimizer_config": {"learning_rate": 1e-3, "beta_1": 0.5},
        },
    }
    if gan:
        conf["model"]["generator"]["loss_functions"].append(
            {"loss_function": "AdversarialLoss", "weighted": True,
             "loss_weight": 1e-3})
        conf["model"]["discriminator"] = {
            "relativistic": False,
            "label_smoothing": True,
            "smoothing_offset": 0.2,
            "num_filters": 8,
            "input_dims": (32, 32),
            "dtype": jnp.float32,
            "loss_functions": [{"loss_function": "DiscriminatorLoss"}],
        }
        conf["model"]["discriminator_optimizer"] = "Adam"
        conf["model"]["discriminator_optimizer_config"] = {"learning_rate": 1e-4}
    return conf


def test_from_yaml_training_roundtrip(tmp_path):
    conf, pipeline, sr_model = ConfigUtil.from_yaml(_training_yaml(tmp_path))
    assert conf.operation == "training"
    assert conf.scale == 2 and conf.batch_size == 4
    assert pipeline.num_crops == 2
    assert [n for n, _ in pipeline.augmentations] == ["flip_along_x", "rotate90"]
    assert sr_model.model_type == "resnet"
    losses = sr_model.generator_wrapper().loss_functions()
    assert losses[0].name == "mean_squared_error"
    assert losses[0].weighted and losses[0].loss_weight == 0.5
    # save dirs created
    import os
    for attr in ["checkpoint_dir", "model_dir", "pic_dir_train", "pic_dir_val",
                 "pic_dir_test", "log_dir_train_epoch"]:
        assert os.path.isdir(getattr(conf, attr))
    assert conf.epoch_train_summary_writer is not None


def test_from_yaml_generator_remat(tmp_path):
    conf = _training_yaml(tmp_path)
    conf["model"]["generator"]["remat"] = True
    _, _, sr_model = ConfigUtil.from_yaml(conf)
    module = sr_model.generator_wrapper().model()
    assert module.remat
    assert sr_model.generator_wrapper().module_config()["remat"] is True


def test_from_yaml_gan(tmp_path):
    conf, pipeline, sr_model = ConfigUtil.from_yaml(_training_yaml(tmp_path, gan=True))
    assert sr_model.model_type == "gan"
    disc = sr_model.discriminator_wrapper()
    assert disc.loss_function().name == "discriminator_loss"
    assert not disc.relativistic


def test_from_yaml_evaluation(tmp_path):
    conf_yaml = {
        "general": {
            "operation": "evaluation",
            "data_paths": GRAD_DIR,
            "test_originals_path": None,
            "model_paths": None,
            "results_save_path": str(tmp_path / "results"),
            "scale": 2,
            "batch_size": 1,
            "resize_filter": "BICUBIC",
        },
    }
    conf, pipeline = ConfigUtil.from_yaml(conf_yaml)
    assert conf.operation == "evaluation"
    assert conf.resize_filter == "bicubic"
    batches = list(pipeline.validation_batch_generator())
    assert batches


def test_invalid_operation_raises(tmp_path):
    with pytest.raises(ValueError):
        ConfigUtil.from_yaml({"general": {"operation": "bogus"}})


def test_invalid_augmentation_raises(tmp_path):
    conf = _training_yaml(tmp_path)
    conf["general"]["augmentations"] = ["no_such_aug"]
    with pytest.raises(ValueError):
        ConfigUtil.from_yaml(conf)


def test_missing_data_dir_raises(tmp_path):
    conf = _training_yaml(tmp_path)
    conf["general"]["train_data_paths"] = "/no/such/dir"
    with pytest.raises(ValueError):
        ConfigUtil.from_yaml(conf)


def test_yaml_file_with_python_tuple_tag(tmp_path):
    """Reference example YAMLs use !!python/tuple (minimal_example.yaml)."""
    p = tmp_path / "c.yaml"
    p.write_text(
        "general:\n"
        "  operation: training\n"
        "  crop_size: !!python/tuple [80, 80, 3]\n")
    loaded = yaml_helper.load_yaml(str(p))
    assert loaded["general"]["crop_size"] == (80, 80, 3)


def test_experiment_sweep_isolation(tmp_path):
    """Reference tests/operations/test_experiment.py:8-72 — overrides apply
    per-experiment and the base config is untouched."""
    base = ConfigUtil.training_config(
        train_data_paths=NOISE_DIR, num_epochs=2, batch_size=4, scale=2,
        results_save_path=str(tmp_path), operation="testing",
        create_save_dirs=False)
    params = [
        {"exp_a": {"batch_size": 8}},
        {"exp_b": {"num_epochs": 5, "scale": 4}},
        {"exp_c": {}},
    ]
    exp = Experiment.initialize_experiment(base, params, include_base_config=True)
    configs = list(exp.next_config())
    assert len(configs) == 4
    assert configs[0].batch_size == 4           # base config first
    assert configs[1].batch_size == 8
    assert configs[2].num_epochs == 5 and configs[2].scale == 4
    assert configs[3].batch_size == 4
    assert base.batch_size == 4 and base.num_epochs == 2  # isolation
    assert configs[1].save_path.endswith("exp_a")

    exp.add_result({"loss": [1.0]}, {}, {"loss": [1.0]}, {})
    exp.serialize_last_result(str(tmp_path / "res"))
    assert list((tmp_path / "res").glob("*.json"))


def test_discriminator_from_yaml_multi_loss():
    """Two discriminator losses hydrate and SUM (the reference's from_yaml
    builds a loss_functions list its ctor can't hold, discriminator.py:53,
    363-384 — here multi-loss is supported for real)."""
    import jax
    from simplesr_tpu.train import Discriminator

    conf = {"model": {"discriminator": {
        "relativistic": False,
        "num_filters": 8,
        "input_dims": (32, 32),
        "dtype": jnp.float32,
        "loss_functions": [
            {"loss_function": "DiscriminatorLoss"},
            {"loss_function": "DiscriminatorLoss",
             "weighted": True, "loss_weight": 0.5},
        ],
    }}}
    disc = Discriminator.from_yaml(conf)
    fns = disc.loss_function()
    assert isinstance(fns, list) and len(fns) == 2
    sr_c = jnp.asarray([[0.3], [0.7]])
    hr_c = jnp.asarray([[0.8], [0.9]])
    total, metrics = disc.calculate_loss(jax.random.key(0), sr_c, hr_c)
    single, _ = fns[0](sr_c, hr_c, jnp.zeros_like(sr_c), jnp.ones_like(hr_c))
    # unweighted + 0.5-weighted copy of the same loss = 1.5x the single loss
    np.testing.assert_allclose(float(total), 1.5 * float(single), rtol=1e-6)
    assert "discriminator_accuracy" in metrics


def test_latest_symlink_points_at_newest_run(tmp_path):
    from simplesr_tpu.config.config_util import ConfigUtil

    for _ in range(2):
        cfg = ConfigUtil.training_config(
            train_data_paths=str(tmp_path), num_epochs=1, batch_size=1, scale=2,
            results_save_path=str(tmp_path))
    link = tmp_path / "training" / "latest"
    assert link.is_symlink()
    assert (tmp_path / "training" / link.readlink()).resolve() == \
        (tmp_path / "training" / cfg.save_dir_name).resolve()

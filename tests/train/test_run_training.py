"""End-to-end run_training smoke: real epochs over fixture images, loss
decreases, artifacts (models, checkpoints, json histories, grids) appear.
Mirrors the reference's runnable minimal example
(examples/training/minimal_example.yaml) at test scale."""

import json

import numpy as np
import jax.numpy as jnp

from simplesr_tpu.data import DataPipeline
from simplesr_tpu.train import Generator, SRModel, run_training

NOISE_DIR = "/root/reference/tests/data/patterns/random_noise"


class _Cfg:
    num_epochs = 2
    scale = 2
    batch_size = 4
    early_stop_metric = "psnr"
    early_stop_patience = 100
    epoch_train_summary_writer = None
    batch_train_summary_writer = None
    epoch_validation_summary_writer = None
    batch_validation_summary_writer = None
    resize_filter = "bicubic"
    antialias = True
    crop_imgs = True
    crop_size = (16, 16, 3)
    num_crops = 2
    random_seed = 1
    crop_naive = True
    minimum_variation_patch = 0.0
    minimum_variation_batch = 0.0

    def __init__(self, tmp_path):
        self.save_path = str(tmp_path)
        self.model_dir = str(tmp_path / "models")
        self.checkpoint_dir = str(tmp_path / "checkpoints")
        self.pic_dir = str(tmp_path / "pics")
        self.pic_dir_train = str(tmp_path / "pics" / "train")
        self.pic_dir_val = str(tmp_path / "pics" / "val")
        self.pic_dir_test = str(tmp_path / "pics" / "test")
        self.config_logfile = str(tmp_path / "config_logfile")
        self.perf_logfile = str(tmp_path / "perf_logfile")

    def __str__(self):
        return "test config"


def test_run_training_end_to_end(tmp_path):
    cfg = _Cfg(tmp_path)
    pipeline = DataPipeline(
        hr_img_path=NOISE_DIR, scale=2, train_val_split=0.25, batch_size=4,
        crop=True, crop_size=(16, 16, 3), num_crops=2, random_seed=3)
    gen = Generator.srresnet(upsample_factor=2, num_blocks=1, num_filters=8,
                             dtype=jnp.float32, input_dims=(16, 16))
    model = SRModel(model_type="resnet", generator=gen,
                    generator_optimizer="Adam",
                    generator_optimizer_config={"learning_rate": 1e-3},
                    config=cfg)
    result = run_training(cfg, pipeline, model, plotting_interval=1)

    hist = model.histories()
    assert len(hist["train_epoch"]["generator_loss"]) == 2
    # pixel loss must decrease over two epochs of noise-fitting
    assert hist["train_epoch"]["generator_loss"][-1] <= \
        hist["train_epoch"]["generator_loss"][0]
    # validation metrics recorded
    assert len(hist["valid_epoch"]["psnr"]) == 2
    # artifacts
    assert list((tmp_path / "models").glob("resnet_gen_*.msgpack"))
    assert list((tmp_path / "models").glob("resnet_gen_best.msgpack"))
    assert list((tmp_path / "json_dump").glob("*.json"))
    assert (tmp_path / "config_logfile").exists()
    # perf log written per epoch (the reference creates the path but never
    # writes it; here it carries epoch timings)
    perf = (tmp_path / "perf_logfile").read_text()
    assert perf.count("epoch=") == 2 and "duration_s=" in perf
    assert list((tmp_path / "pics" / "train").rglob("*.png"))  # plotted grid
    # json round-trips
    f = next((tmp_path / "json_dump").glob("*train_epoch_history.json"))
    data = json.loads(f.read_text())
    assert "generator_loss" in data

"""run_training(profile_dir=...) captures a jax.profiler trace (the
reference's perf-logging analogue, SURVEY.md §5)."""

import os

import jax.numpy as jnp

from simplesr_tpu.data import DataPipeline
from simplesr_tpu.train import Generator, SRModel, run_training

NOISE_DIR = "/root/reference/tests/data/patterns/random_noise"


def test_profile_trace_written(tmp_path):
    class Cfg:
        num_epochs = 1
        batch_size = 4
        early_stop_metric = "psnr"
        early_stop_patience = 100
        epoch_train_summary_writer = None
        batch_train_summary_writer = None
        epoch_validation_summary_writer = None
        batch_validation_summary_writer = None
        scale = 2
        resize_filter = "bicubic"
        antialias = True
        crop_imgs = True
        crop_size = (16, 16, 3)
        num_crops = 1
        random_seed = 0
        crop_naive = True
        minimum_variation_patch = 0.0
        minimum_variation_batch = 0.0
        save_path = str(tmp_path)
        model_dir = str(tmp_path / "models")
        checkpoint_dir = str(tmp_path / "ckpt")
        pic_dir = str(tmp_path / "pics")
        pic_dir_train = str(tmp_path / "pics/train")
        pic_dir_val = str(tmp_path / "pics/val")
        pic_dir_test = str(tmp_path / "pics/test")
        config_logfile = str(tmp_path / "config_logfile")
        perf_logfile = str(tmp_path / "perf_logfile")

    pipeline = DataPipeline(hr_img_path=NOISE_DIR, scale=2, train_val_split=0.25,
                            batch_size=4, crop_size=(16, 16, 3), num_crops=1,
                            random_seed=1)
    gen = Generator.srresnet(upsample_factor=2, num_blocks=1, num_filters=8,
                             dtype=jnp.float32, input_dims=(16, 16))
    model = SRModel(model_type="resnet", generator=gen,
                    generator_optimizer="Adam", config=Cfg)
    prof_dir = str(tmp_path / "trace")
    run_training(Cfg, pipeline, model, plotting_interval=0,
                 profile_dir=prof_dir)
    # a plugins/profile/<ts>/ dir with trace artifacts must exist
    found = []
    for root, dirs, files in os.walk(prof_dir):
        found += [f for f in files if "trace" in f or f.endswith(".pb")
                  or f.endswith(".json.gz") or f.endswith(".xplane.pb")]
    assert found, f"no trace artifacts under {prof_dir}"

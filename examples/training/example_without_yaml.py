"""Pure-Python training recipes (no YAML), mirroring the reference's
examples/training/example_without_yaml.py: the four paper configurations and
the two-stage pretrain→GAN pipeline (:315-326)."""

import os

from simplesr_tpu.config import ConfigUtil
from simplesr_tpu.data import DataPipeline
from simplesr_tpu.train import Generator, Discriminator, SRModel, run_training
from simplesr_tpu.train.optimizers import piecewise_constant_decay
from simplesr_tpu.ops import metrics

TRAIN_DATA = "/root/reference/data/datasets/div2k/2"
VAL_DATA = "/root/reference/tests/data/patterns/gradients"
RESULTS = "./data/results"


def _config(scale=2, num_epochs=3, crop=96, batch_size=8):
    return ConfigUtil.training_config(
        train_data_paths=TRAIN_DATA, validation_data_path=VAL_DATA,
        num_epochs=num_epochs, batch_size=batch_size, scale=scale,
        crop_imgs=True, crop_size=(crop, crop, 3), num_crops=8,
        augmentations=["flip_along_x", "flip_along_y", "rotate90"],
        results_save_path=RESULTS)


def srresnet_example():
    """SRResNet pixel-loss pretraining (reference :29-77)."""
    config = _config()
    pipeline = DataPipeline.from_config(config)
    generator = Generator.srresnet(upsample_factor=config.scale)
    sr_model = SRModel.init(
        config, generator, generator_optimizer="Adam",
        generator_optimizer_config={
            "learning_rate": piecewise_constant_decay([100000], [1e-4, 1e-5])},
        image_metrics={"psnr": metrics.psnr, "ssim": metrics.ssim})
    run_training(config, pipeline, sr_model)
    return config, sr_model


def srgan_example(pretrained_model_path=None):
    """SRGAN: VGG54 + adversarial, standard discriminator (reference :78-139)."""
    config = _config()
    pipeline = DataPipeline.from_config(config)
    generator = Generator.srgan_generator(
        upsample_factor=config.scale, vgg_loss=True,
        vgg_layer="block5_conv4", vgg_feature_scaling=1 / 12.75,
        adversarial_loss_weight=1e-3,
        pretrained_model_path=pretrained_model_path)
    discriminator = Discriminator.initialize_standard(
        label_smoothing=True, smoothing_offset=0.2,
        input_dims=config.crop_size[:2])
    sr_model = SRModel.init(
        config, generator, generator_optimizer="Adam",
        generator_optimizer_config={
            "learning_rate": piecewise_constant_decay([100000], [1e-4, 1e-5])},
        discriminator=discriminator, discriminator_optimizer="Adam",
        discriminator_optimizer_config={"learning_rate": 1e-4})
    run_training(config, pipeline, sr_model)
    return config, sr_model


def rrdb_example():
    """RRDB PSNR-oriented pretraining with L1 loss (reference :140-226)."""
    config = _config(crop=128)
    pipeline = DataPipeline.from_config(config)
    generator = Generator.rrdb(upsample_factor=config.scale)
    sr_model = SRModel.init(
        config, generator, generator_optimizer="Adam",
        generator_optimizer_config={
            "learning_rate": piecewise_constant_decay(
                [200000, 400000], [2e-4, 1e-4, 5e-5])})
    run_training(config, pipeline, sr_model)
    return config, sr_model


def esrgan_example(pretrained_model_path=None):
    """ESRGAN: RRDB + Ra losses + pre-activation VGG (reference :227-313)."""
    config = _config(crop=128)
    pipeline = DataPipeline.from_config(config)
    schedule = piecewise_constant_decay(
        [50000, 100000, 200000, 300000],
        [1e-4, 5e-5, 2.5e-5, 1.25e-5, 6.25e-6])
    generator = Generator.esrgan_generator(
        upsample_factor=config.scale,
        pretrained_model_path=pretrained_model_path)
    discriminator = Discriminator.initialize_relativistic(
        input_dims=config.crop_size[:2])
    sr_model = SRModel.init(
        config, generator, generator_optimizer="Adam",
        generator_optimizer_config={"learning_rate": schedule},
        discriminator=discriminator, discriminator_optimizer="Adam",
        discriminator_optimizer_config={"learning_rate": schedule})
    run_training(config, pipeline, sr_model)
    return config, sr_model


def two_stage_pipeline():
    """Pretrain a pixel model, then warm-start the GAN generator from it
    (reference :315-326)."""
    config, pretrain_model = srresnet_example()
    best = os.path.join(config.model_dir, "resnet_gen_best.msgpack")
    return srgan_example(pretrained_model_path=best)


if __name__ == "__main__":
    srresnet_example()

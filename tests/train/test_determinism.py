"""Seeded end-to-end reproducibility: two identically-seeded full
run_training sessions (real DataPipeline with its multi-worker host
assembly, augment fan-out, shuffling, validation, checkpointing) must end
with BIT-IDENTICAL generator params.

This is a framework guarantee, not a smoke test: it pins the pipeline's
deterministic assembly ordering (a racy decode/crop worker would surface
here first), the seeded shuffle, and the jitted step's determinism on a
fixed backend. The reference offers `random_seed` with the same intent
(config_util.py there) but never tests it.
"""

import numpy as np
import jax
import jax.numpy as jnp

from simplesr_tpu.data import DataPipeline
from simplesr_tpu.train import Generator, SRModel, run_training
from tests.train.test_run_training import NOISE_DIR, _Cfg


def _train_once(tmp_path, tag):
    cfg = _Cfg(tmp_path / tag)
    import os
    for d in (cfg.model_dir, cfg.checkpoint_dir, cfg.pic_dir_train,
              cfg.pic_dir_val, cfg.pic_dir_test):
        os.makedirs(d, exist_ok=True)
    pipeline = DataPipeline(
        hr_img_path=NOISE_DIR, scale=2, train_val_split=0.25, batch_size=4,
        crop=True, crop_size=(16, 16, 3), num_crops=2, random_seed=7,
        augmentations=["flip_along_x", "rotate90"])
    gen = Generator.srresnet(upsample_factor=2, num_blocks=1, num_filters=8,
                             dtype=jnp.float32, input_dims=(16, 16), seed=0)
    model = SRModel(model_type="resnet", generator=gen,
                    generator_optimizer="Adam",
                    generator_optimizer_config={"learning_rate": 1e-3},
                    config=cfg, seed=0)
    run_training(cfg, pipeline, model, plotting_interval=10)
    return jax.device_get(model.state.g_params), model.histories()


def test_same_seed_is_bit_reproducible(tmp_path):
    p1, h1 = _train_once(tmp_path, "a")
    p2, h2 = _train_once(tmp_path, "b")
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b), p1, p2)
    assert h1["train_epoch"]["generator_loss"] == \
        h2["train_epoch"]["generator_loss"]


def test_different_seed_diverges(tmp_path):
    """The reproducibility above must come from the seeds, not from the
    data being trivial: a different pipeline seed produces different
    params (guards against a test that would pass vacuously)."""
    p1, _ = _train_once(tmp_path, "a")
    cfg = _Cfg(tmp_path / "c")
    import os
    for d in (cfg.model_dir, cfg.checkpoint_dir, cfg.pic_dir_train,
              cfg.pic_dir_val, cfg.pic_dir_test):
        os.makedirs(d, exist_ok=True)
    pipeline = DataPipeline(
        hr_img_path=NOISE_DIR, scale=2, train_val_split=0.25, batch_size=4,
        crop=True, crop_size=(16, 16, 3), num_crops=2, random_seed=11,
        augmentations=["flip_along_x", "rotate90"])
    gen = Generator.srresnet(upsample_factor=2, num_blocks=1, num_filters=8,
                             dtype=jnp.float32, input_dims=(16, 16), seed=0)
    model = SRModel(model_type="resnet", generator=gen,
                    generator_optimizer="Adam",
                    generator_optimizer_config={"learning_rate": 1e-3},
                    config=cfg, seed=0)
    run_training(cfg, pipeline, model, plotting_interval=10)
    p2 = jax.device_get(model.state.g_params)
    flat1 = jax.tree_util.tree_leaves(p1)
    flat2 = jax.tree_util.tree_leaves(p2)
    assert any(not np.array_equal(a, b) for a, b in zip(flat1, flat2))

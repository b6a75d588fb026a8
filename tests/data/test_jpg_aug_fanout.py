"""The adjust_jpg_quality augmentation inside the pipeline's per-sample
lax.switch fan-out (the heaviest augmentation branch) must compile and
produce valid, actually-degraded HR samples."""

import numpy as np
import jax.numpy as jnp

from simplesr_tpu.data import DataPipeline

NOISE_DIR = "/root/reference/tests/data/patterns/random_noise"


def test_jpg_quality_augmentation_in_fanout():
    p = DataPipeline(hr_img_path=NOISE_DIR, scale=2, train_val_split=0.25,
                     batch_size=4, crop=True, crop_size=(16, 16, 3),
                     num_crops=1, random_seed=2,
                     augmentations=["adjust_jpg_quality"])
    batches = list(p.train_batch_generator())
    total = sum(int(b[0].shape[0]) for b in batches)
    assert total == 6 * 1 * 2  # 6 imgs × 1 crop × (identity + jpg aug)
    for lr, hr in batches:
        assert np.isfinite(np.asarray(hr)).all()
        assert float(jnp.max(hr)) <= 1.0 + 1e-5
        assert float(jnp.min(hr)) >= -1.0 - 1e-5

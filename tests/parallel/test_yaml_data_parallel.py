"""data_parallel=True flows from the config surface into a mesh-sharded
SRModel (8-virtual-device CPU mesh)."""

import numpy as np
import jax.numpy as jnp

from simplesr_tpu.config import ConfigUtil

NOISE_DIR = "/root/reference/tests/data/patterns/random_noise"


def test_yaml_data_parallel_training(tmp_path):
    conf_yaml = {
        "general": {
            "operation": "training",
            "train_data_paths": NOISE_DIR,
            "results_save_path": str(tmp_path),
            "num_epochs": 1,
            "batch_size": 8,
            "scale": 2,
            "train_val_split": 0.25,
            "crop_imgs": True,
            "crop_size": (16, 16, 3),
            "num_crops": 2,
            "random_seed": 0,
            "data_parallel": True,
        },
        "model": {
            "generator": {
                "upsample_factor": 2,
                "architecture": "srresnet",
                "num_blocks": 1,
                "num_filters": 8,
                "input_dims": (16, 16),
                "dtype": "float32",
                "loss_functions": [{"loss_function": "MeanSquaredError"}],
            },
            "generator_optimizer": "Adam",
            "generator_optimizer_config": {"learning_rate": 1e-3},
        },
    }
    conf, pipeline, model = ConfigUtil.from_yaml(conf_yaml)
    assert model._mesh is not None
    assert model._mesh.devices.size == 8

    # a sharded train step executes and params land replicated
    rng = np.random.default_rng(0)
    lr = rng.uniform(0, 1, (8, 16, 16, 3)).astype(np.float32)
    hr = rng.uniform(-1, 1, (8, 32, 32, 3)).astype(np.float32)
    model.before_epoch()
    model.train_step(lr, hr)
    model.after_train_batch()
    leaf = next(iter(jnp.asarray(v) for v in
                     __import__("jax").tree_util.tree_leaves(model.state.g_params)))
    assert np.isfinite(np.asarray(leaf)).all()

"""Tensor-parallel TRAINING (SRModel(tensor_parallel=True)): the fused step
with the generator channel-split over a 'model' mesh axis must reproduce the
single-device update on the unchanged state pytree — the collectives'
transposes shard the backward trunk FLOPs without changing the math."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from simplesr_tpu.train import Generator, Discriminator, SRModel
from simplesr_tpu.parallel import make_mesh, MODEL_AXIS, DATA_AXIS


def _gen(arch="srresnet", nf=8):
    if arch == "rrdb":
        return Generator.rrdb(upsample_factor=2, num_blocks=1,
                              num_dense_blocks=2, num_convs=2,
                              num_filters=nf, dtype=jnp.float32,
                              input_dims=(8, 8))
    return Generator.srresnet(upsample_factor=2, num_blocks=2,
                              num_filters=nf, batch_norm=False,
                              dtype=jnp.float32, input_dims=(8, 8))


def _cfg(tmp_path, sub):
    class Cfg:
        model_dir = str(tmp_path / sub / "models")
        checkpoint_dir = str(tmp_path / sub / "checkpoints")
        early_stop_metric = "psnr"
        early_stop_patience = 100
        epoch_train_summary_writer = None
        batch_train_summary_writer = None
        epoch_validation_summary_writer = None
        batch_validation_summary_writer = None
    return Cfg


def _model(tmp_path, sub, mesh=None, tensor_parallel=False, arch="srresnet",
           nf=8):
    # SGD: Adam's normalization amplifies reduction-order noise in tiny
    # gradients (same rationale as the driver dryrun's certification 1)
    return SRModel(model_type="resnet", generator=_gen(arch, nf),
                   generator_optimizer="SGD",
                   generator_optimizer_config={"learning_rate": 1e-2},
                   config=_cfg(tmp_path, sub), mesh=mesh,
                   tensor_parallel=tensor_parallel)


def _batch(rng, n=4):
    lr = rng.uniform(0, 1, (n, 8, 8, 3)).astype(np.float32)
    hr = rng.uniform(-1, 1, (n, 16, 16, 3)).astype(np.float32)
    return lr, hr


def _leaves(model):
    return [np.asarray(x) for x in
            jax.tree_util.tree_leaves(jax.device_get(model.state.g_params))]


@pytest.mark.parametrize("arch", ["srresnet", "rrdb"])
def test_tp_training_matches_single_device(rng, tmp_path, arch):
    lr, hr = _batch(rng)
    mesh = make_mesh({DATA_AXIS: 2, MODEL_AXIS: 4})
    tp = _model(tmp_path, f"tp_{arch}", mesh=mesh, tensor_parallel=True,
                arch=arch)
    single = _model(tmp_path, f"sd_{arch}", arch=arch)
    for _ in range(2):
        tp.train_step(lr, hr)
        single.train_step(lr, hr)
    for a, b in zip(_leaves(tp), _leaves(single)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_tp_only_mesh_replicates_batch(rng, tmp_path):
    # pure-TP mesh (no data axis): batch is replicated, not split — odd
    # batch sizes must not be trimmed
    lr, hr = _batch(rng, n=3)
    mesh = make_mesh({MODEL_AXIS: 4}, devices=jax.devices()[:4])
    tp = _model(tmp_path, "tponly", mesh=mesh, tensor_parallel=True)
    single = _model(tmp_path, "sdonly")
    tp.train_step(lr, hr)
    single.train_step(lr, hr)
    for a, b in zip(_leaves(tp), _leaves(single)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_tp_validation_and_generate(rng, tmp_path):
    lr, hr = _batch(rng)
    mesh = make_mesh({DATA_AXIS: 2, MODEL_AXIS: 4})
    tp = _model(tmp_path, "tpval", mesh=mesh, tensor_parallel=True)
    tp.before_epoch()
    tp.validation_step(lr, hr)
    val = tp.generator_wrapper().epoch_metrics(train=False).results()
    assert np.isfinite(val["generator_loss"])
    sr = tp.generate(lr)
    assert sr.shape == (4, 16, 16, 3)


def test_tp_requires_model_axis(tmp_path):
    with pytest.raises(ValueError, match="model"):
        _model(tmp_path, "bad", mesh=make_mesh({DATA_AXIS: 8}),
               tensor_parallel=True)
    with pytest.raises(ValueError, match="mesh"):
        _model(tmp_path, "bad2", mesh=None, tensor_parallel=True)


def test_tp_gan_training_matches_single_device(rng, tmp_path):
    lr, hr = _batch(rng)
    mesh = make_mesh({DATA_AXIS: 2, MODEL_AXIS: 4})

    def gan(sub, use_mesh, tp):
        gen = _gen()
        disc = Discriminator.initialize_standard(
            label_smoothing=True, smoothing_offset=0.2, num_filters=8,
            input_dims=(16, 16), dtype=jnp.float32)
        return SRModel(model_type="gan", generator=gen,
                       generator_optimizer="SGD",
                       generator_optimizer_config={"learning_rate": 1e-2},
                       discriminator=disc, discriminator_optimizer="SGD",
                       discriminator_optimizer_config={"learning_rate": 1e-2},
                       config=_cfg(tmp_path, sub), mesh=use_mesh,
                       tensor_parallel=tp)

    tp_m = gan("gan_tp", mesh, True)
    sd_m = gan("gan_sd", None, False)
    for _ in range(2):
        tp_m.train_step(lr, hr)
        sd_m.train_step(lr, hr)
    for a, b in zip(_leaves(tp_m), _leaves(sd_m)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_tp_no_involuntary_rematerialization(rng, tmp_path, capfd):
    """The TP fused train step must compile without the SPMD partitioner's
    "Involuntary full rematerialization" fallback (r3 MULTICHIP tail: the
    channel-sharded trunk activation hit the SubpixelConvBlock
    depth_to_space reshape, whose r×r dims can't represent a channel
    sharding, so XLA replicated the full HR activation every step). The
    shard_map TP forward keeps the subpixel tail replicated
    (parallel/tensor.py) — this pins that the warning stays gone."""
    lr, hr = _batch(rng)
    mesh = make_mesh({DATA_AXIS: 2, MODEL_AXIS: 4})
    tp = _model(tmp_path, "tp_remat", mesh=mesh, tensor_parallel=True)
    tp.train_step(lr, hr)  # compiles the fused step (GSPMD partitioning)
    tp.validation_step(lr, hr)
    jax.block_until_ready(tp.state.g_params)
    err = capfd.readouterr().err
    assert "Involuntary full rematerialization" not in err

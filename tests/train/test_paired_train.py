"""Paired-trunk training (train/paired.py): exactness of the packed-layout
forward/gradients vs the standard flax apply, SRModel integration, and the
guard rails (BN, ways, divisibility, tp/pp exclusivity)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from simplesr_tpu.models.srresnet import SRResNet
from simplesr_tpu.ops.pairing import pack_batch, unpack_batch
from simplesr_tpu.ops.shuffle import depth_to_space
from simplesr_tpu.train import Generator, SRModel
from simplesr_tpu.train.paired import (_depth_to_space_packed,
                                       paired_train_apply)


def _module(scale=2, blocks=2, filters=8, dtype=jnp.float32, remat=False):
    return SRResNet(upsample_factor=scale, num_filters=filters,
                    num_res_blocks=blocks, batch_norm=False, dtype=dtype,
                    remat=remat)


def _init(module, b=4, hw=8, seed=0):
    x = jax.random.uniform(jax.random.key(seed), (b, hw, hw, 3))
    variables = module.init(jax.random.key(1), x, train=True)
    return variables["params"], x


def test_depth_to_space_packed_matches_unpack_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(3, 4, 5, 2 * 8)).astype(np.float32))
    got = _depth_to_space_packed(x, 2, ways=2)
    want = pack_batch(depth_to_space(unpack_batch(x, 2), 2), 2)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("scale", [2, 4])
@pytest.mark.parametrize("ways", [2, 4])
def test_forward_matches_standard_apply(scale, ways):
    module = _module(scale=scale)
    params, x = _init(module, b=4)
    want = module.apply({"params": params}, x, train=True)
    got = paired_train_apply(module, ways)(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_gradients_match_standard_apply():
    module = _module(scale=2, blocks=2)
    params, x = _init(module, b=4)
    y = jax.random.uniform(jax.random.key(7), (4, 16, 16, 3)) * 2 - 1
    paired = paired_train_apply(module, 2)

    def loss_std(p):
        return jnp.mean((module.apply({"params": p}, x, train=True) - y) ** 2)

    def loss_paired(p):
        return jnp.mean((paired(p, x) - y) ** 2)

    g_std = jax.grad(loss_std)(params)
    g_paired = jax.grad(loss_paired)(params)
    flat_std, tree_std = jax.tree_util.tree_flatten_with_path(g_std)
    flat_paired, tree_paired = jax.tree_util.tree_flatten_with_path(g_paired)
    assert tree_std == tree_paired
    for (path, a), (_, b) in zip(flat_std, flat_paired):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-4,
            err_msg=jax.tree_util.keystr(path))


def test_remat_variant_matches():
    module = _module(scale=2, remat=True)
    params, x = _init(module, b=2)
    want = module.apply({"params": params}, x, train=True)
    got = paired_train_apply(module, 2)(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


# ------------------------------------------------------- SRModel integration

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


def _resnet_model(tmp_path, paired_ways=None, seed=3):
    gen = Generator.srresnet(upsample_factor=2, num_blocks=1, num_filters=8,
                             batch_norm=False, dtype=jnp.float32,
                             input_dims=(16, 16))
    return SRModel(model_type="resnet", generator=gen,
                   generator_optimizer="Adam",
                   generator_optimizer_config={"learning_rate": 1e-3},
                   config=_cfg(tmp_path), seed=seed,
                   paired_ways=paired_ways)


def test_sr_model_paired_step_equals_unpaired(tmp_path):
    rng = np.random.default_rng(0)
    lr = rng.uniform(0, 1, (4, 16, 16, 3)).astype(np.float32)
    hr = rng.uniform(-1, 1, (4, 32, 32, 3)).astype(np.float32)
    m_std = _resnet_model(tmp_path / "a")
    m_paired = _resnet_model(tmp_path / "b", paired_ways=2)
    for _ in range(2):
        m_std.train_step(lr, hr)
        m_paired.train_step(lr, hr)
    flat_a = jax.tree_util.tree_leaves(m_std.state.g_params)
    flat_b = jax.tree_util.tree_leaves(m_paired.state.g_params)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_sr_model_paired_trims_undivisible_batch(tmp_path):
    rng = np.random.default_rng(1)
    lr = rng.uniform(0, 1, (3, 16, 16, 3)).astype(np.float32)
    hr = rng.uniform(-1, 1, (3, 32, 32, 3)).astype(np.float32)
    m = _resnet_model(tmp_path, paired_ways=2)
    m.train_step(lr, hr)  # trims 3 -> 2 instead of raising
    assert int(m.state.step) == 1
    # validation runs the standard layout: odd batches pass untouched
    m.validation_step(lr, hr)


def test_paired_rejects_batch_norm():
    module = SRResNet(upsample_factor=2, num_filters=8, num_res_blocks=1,
                      batch_norm=True)
    with pytest.raises(ValueError, match="batch_norm"):
        paired_train_apply(module, 2)


def test_paired_rejects_ways_one():
    with pytest.raises(ValueError, match="ways"):
        paired_train_apply(_module(), 1)


def test_paired_rejects_tensor_parallel(tmp_path):
    from simplesr_tpu.parallel import make_mesh, DATA_AXIS, MODEL_AXIS
    gen = Generator.srresnet(upsample_factor=2, num_blocks=1, num_filters=8,
                             batch_norm=False, dtype=jnp.float32,
                             input_dims=(16, 16))
    with pytest.raises(ValueError, match="mutually exclusive"):
        SRModel(model_type="resnet", generator=gen,
                generator_optimizer="Adam",
                generator_optimizer_config={"learning_rate": 1e-3},
                config=_cfg(tmp_path),
                mesh=make_mesh({DATA_AXIS: 4, MODEL_AXIS: 2}),
                tensor_parallel=True, paired_ways=2)


def test_config_knob_reaches_sr_model(tmp_path):
    from simplesr_tpu.config import ConfigUtil
    cfg = ConfigUtil.training_config(
        train_data_paths="/tmp/x", num_epochs=1, batch_size=4, scale=2,
        results_save_path=str(tmp_path), create_save_dirs=False,
        paired_train=2)
    assert cfg.paired_train == 2
    gen = Generator.srresnet(upsample_factor=2, num_blocks=1, num_filters=8,
                             batch_norm=False, dtype=jnp.float32,
                             input_dims=(16, 16))
    cfg.model_dir = str(tmp_path / "models")
    cfg.checkpoint_dir = str(tmp_path / "ckpt")
    cfg.epoch_train_summary_writer = None
    cfg.batch_train_summary_writer = None
    cfg.epoch_validation_summary_writer = None
    cfg.batch_validation_summary_writer = None
    model = SRModel.init(cfg, gen, "Adam", {"learning_rate": 1e-3})
    assert model._paired_fwd is not None and model._paired_ways == 2

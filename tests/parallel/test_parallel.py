"""Parallelism tests on the 8-virtual-device CPU mesh: data-parallel training
equivalence, halo-exchange spatially-sharded inference exactness, sharding
placement."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from simplesr_tpu.parallel import (
    make_mesh, data_sharding, replicated, shard_batch, halo_exchange,
    spatial_sharded_apply, DATA_AXIS, SPATIAL_AXIS,
)


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape == {DATA_AXIS: 8}
    mesh2 = make_mesh({DATA_AXIS: 4, SPATIAL_AXIS: -1})
    assert mesh2.shape == {DATA_AXIS: 4, SPATIAL_AXIS: 2}
    with pytest.raises(ValueError):
        make_mesh({DATA_AXIS: 3})


def test_shard_batch_places_on_devices(rng):
    mesh = make_mesh()
    x = rng.uniform(size=(16, 8, 8, 3)).astype(np.float32)
    sharded = shard_batch(mesh, jnp.asarray(x))
    assert len(sharded.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(sharded), x)


def test_data_parallel_training_matches_single_device(rng, tmp_path):
    """The dp-sharded train step must produce the same params as the
    unsharded one (same batch, same init) — SPMD is a layout change, not a
    semantics change. SGD keeps the comparison linear in the gradients
    (adaptive optimizers amplify f32 reduction-order noise)."""
    from simplesr_tpu.train import Generator, SRModel

    def build(mesh):
        gen = Generator.srresnet(upsample_factor=2, num_blocks=1, num_filters=8,
                                 dtype=jnp.float32, input_dims=(8, 8))
        class Cfg:
            model_dir = str(tmp_path / ("m" if mesh is None else "mp"))
            checkpoint_dir = str(tmp_path / ("c" if mesh is None else "cp"))
            early_stop_metric = "psnr"; early_stop_patience = 10
            epoch_train_summary_writer = None; batch_train_summary_writer = None
            epoch_validation_summary_writer = None; batch_validation_summary_writer = None
        return SRModel(model_type="resnet", generator=gen,
                       generator_optimizer="SGD",
                       generator_optimizer_config={"learning_rate": 0.1},
                       config=Cfg, mesh=mesh, seed=0)

    lr = rng.uniform(0, 1, size=(8, 8, 8, 3)).astype(np.float32)
    hr = rng.uniform(-1, 1, size=(8, 16, 16, 3)).astype(np.float32)

    single = build(None)
    multi = build(make_mesh())
    for _ in range(3):
        single.train_step(lr, hr)
        multi.train_step(lr, hr)

    a = jax.tree_util.tree_leaves(jax.device_get(single.state.g_params))
    b = jax.tree_util.tree_leaves(jax.device_get(multi.state.g_params))
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y, rtol=1e-4, atol=1e-5)


def test_halo_exchange_ring(rng):
    """Each shard must see its neighbors' edge rows; outer edges zero."""
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    mesh = make_mesh({SPATIAL_AXIS: 8})
    x = rng.uniform(size=(64, 4, 3)).astype(np.float32)

    fn = shard_map(lambda s: halo_exchange(s, 2, SPATIAL_AXIS),
                   mesh=mesh, in_specs=P(SPATIAL_AXIS, None, None),
                   out_specs=P(SPATIAL_AXIS, None, None), check_rep=False)
    out = np.asarray(fn(jnp.asarray(x)))  # (8 shards × 12 rows)
    shard0 = out[:12]
    np.testing.assert_array_equal(shard0[:2], 0.0)           # top zero halo
    np.testing.assert_array_equal(shard0[2:10], x[0:8])      # own rows
    np.testing.assert_array_equal(shard0[10:], x[8:10])      # next's first rows
    shard3 = out[3 * 12:4 * 12]
    np.testing.assert_array_equal(shard3[:2], x[22:24])      # prev's last rows
    np.testing.assert_array_equal(shard3[2:10], x[24:32])


def test_spatial_sharded_apply_exact_for_local_model(rng):
    """With a model whose receptive field fits the halo, sharded and direct
    application agree exactly."""
    mesh = make_mesh({SPATIAL_AXIS: 8})
    img = rng.uniform(size=(64, 16, 3)).astype(np.float32)

    def model(x):  # 3x3 blur then nearest x2 — receptive field 1 < halo
        k = jnp.ones((3, 3, 1, 1)) / 9.0
        k = jnp.tile(k, (1, 1, 1, 3))
        from jax import lax
        dn = lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
        y = lax.conv_general_dilated(x, k, (1, 1), "SAME", dimension_numbers=dn,
                                     feature_group_count=3)
        return jnp.repeat(jnp.repeat(y, 2, axis=1), 2, axis=2)

    out = spatial_sharded_apply(model, jnp.asarray(img), mesh, scale=2, halo=2)
    direct = np.asarray(model(jnp.asarray(img)[None]))[0]
    assert out.shape == direct.shape == (128, 32, 3)
    # interior exact; borders between shards must be seamless
    np.testing.assert_allclose(np.asarray(out)[4:-4], direct[4:-4], atol=1e-6)
    for boundary in range(16, 128, 16):
        np.testing.assert_allclose(np.asarray(out)[boundary - 2:boundary + 2],
                                   direct[boundary - 2:boundary + 2], atol=1e-6)


def test_spatial_apply_with_real_generator(rng):
    """SRResNet strip inference through the spatial mesh compiles + runs."""
    from simplesr_tpu.models import SRResNet

    mesh = make_mesh({SPATIAL_AXIS: 8})
    model = SRResNet(upsample_factor=2, num_res_blocks=1, num_filters=8,
                     dtype=jnp.float32)
    img = rng.uniform(0, 1, size=(64, 16, 3)).astype(np.float32)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))
    out = spatial_sharded_apply(
        lambda x: model.apply(variables, x), jnp.asarray(img), mesh,
        scale=2, halo=4)
    assert out.shape == (128, 32, 3)
    assert np.isfinite(np.asarray(out)).all()

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


def test_uneven_batch_on_mesh_does_not_crash(rng, tmp_path):
    """An uneven final batch (B % n_devices != 0) must be trimmed/skipped
    gracefully under a data mesh, not die with a raw XLA sharding error."""
    from simplesr_tpu.train import Generator, SRModel

    gen = Generator.srresnet(upsample_factor=2, num_blocks=1, num_filters=8,
                             dtype=jnp.float32, input_dims=(8, 8))

    class Cfg:
        model_dir = str(tmp_path / "m"); checkpoint_dir = str(tmp_path / "c")
        early_stop_metric = "psnr"; early_stop_patience = 10
        epoch_train_summary_writer = None; batch_train_summary_writer = None
        epoch_validation_summary_writer = None; batch_validation_summary_writer = None

    model = SRModel(model_type="resnet", generator=gen,
                    generator_optimizer="SGD",
                    generator_optimizer_config={"learning_rate": 0.1},
                    config=Cfg, mesh=make_mesh(), seed=0)

    def batch(b):
        lr = rng.uniform(0, 1, size=(b, 8, 8, 3)).astype(np.float32)
        hr = rng.uniform(-1, 1, size=(b, 16, 16, 3)).astype(np.float32)
        return lr, hr

    model.train_step(*batch(8))          # even: full batch
    step_after_even = int(model.state.step)
    model.train_step(*batch(12))         # uneven: trimmed to 8
    assert int(model.state.step) == step_after_even + 1
    model.train_step(*batch(5))          # smaller than mesh: skipped
    assert int(model.state.step) == step_after_even + 1
    model.validation_step(*batch(12))    # validation path trims too


def test_pipeline_drop_remainder(tmp_path):
    """drop_remainder=True yields only full batches from the train
    generator (needed for static per-device shapes under a mesh)."""
    from PIL import Image
    d = tmp_path / "imgs"; d.mkdir()
    arr = (np.arange(48 * 48 * 3) % 255).reshape(48, 48, 3).astype(np.uint8)
    for i in range(3):
        Image.fromarray(arr).save(d / f"{i}.png")

    from simplesr_tpu.data import DataPipeline
    # 3 imgs x 1 crop x 1 (no augs) = 3 items, batch 2 -> 2 batches, last uneven
    kw = dict(hr_img_path=str(d), scale=2, train_val_split=0.0, batch_size=2,
              crop=True, crop_size=(16, 16, 3), num_crops=1, random_seed=0)
    sizes = [b[0].shape[0] for b in
             DataPipeline(**kw).train_batch_generator()]
    assert sorted(sizes) == [1, 2]
    sizes = [b[0].shape[0] for b in
             DataPipeline(drop_remainder=True, **kw).train_batch_generator()]
    assert sizes == [2]

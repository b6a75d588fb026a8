"""Architecture contracts, mirroring reference tests/models/test_model_builder.py:
exact ×{2,4,8} output scaling for SRResNet and RRDB; discriminator ends in
sigmoid iff non-relativistic; parameter-count/shape sanity."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from simplesr_tpu.models import SRResNet, RRDBNet, Discriminator


@pytest.mark.parametrize("scale", [2, 4, 8])
def test_srresnet_output_scaling(scale):
    model = SRResNet(upsample_factor=scale, num_res_blocks=2, dtype=jnp.float32)
    x = jnp.zeros((1, 12, 16, 3))
    variables = model.init(jax.random.key(0), x)
    y = model.apply(variables, x)
    assert y.shape == (1, 12 * scale, 16 * scale, 3)
    assert y.dtype == jnp.float32


@pytest.mark.parametrize("scale", [2, 4])
def test_rrdb_output_scaling(scale):
    model = RRDBNet(upsample_factor=scale, num_rrdb_blocks=1, dtype=jnp.float32)
    x = jnp.zeros((1, 8, 8, 3))
    variables = model.init(jax.random.key(0), x)
    y = model.apply(variables, x)
    assert y.shape == (1, 8 * scale, 8 * scale, 3)


def test_invalid_scale_raises():
    with pytest.raises(ValueError):
        SRResNet(upsample_factor=3)
    with pytest.raises(ValueError):
        RRDBNet(upsample_factor=5)


def test_output_range_is_tanh():
    model = SRResNet(upsample_factor=2, num_res_blocks=1, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (2, 8, 8, 3)), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    y = model.apply(variables, x)
    assert float(jnp.max(y)) <= 1.0 and float(jnp.min(y)) >= -1.0


def test_srresnet_without_batchnorm_has_no_bn_stats():
    model = SRResNet(upsample_factor=2, num_res_blocks=1, batch_norm=False,
                     dtype=jnp.float32)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
    assert "batch_stats" not in variables
    variables_bn = SRResNet(upsample_factor=2, num_res_blocks=1, batch_norm=True,
                            dtype=jnp.float32).init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
    assert "batch_stats" in variables_bn


def test_rrdb_has_no_batchnorm():
    model = RRDBNet(upsample_factor=2, num_rrdb_blocks=1, dtype=jnp.float32)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
    assert "batch_stats" not in variables


@pytest.mark.parametrize("relativistic", [False, True])
def test_discriminator_sigmoid_iff_standard(relativistic):
    """Reference test_model_builder.py:40-49 — sigmoid output only for the
    standard (non-relativistic) critic. To make the check deterministic the
    final Dense kernel is scaled up so raw logits are guaranteed to leave
    [0, 1] when no sigmoid is applied."""
    model = Discriminator(relativistic=relativistic, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(1).normal(0, 5, (2, 32, 32, 3)), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=True)
    variables = jax.tree_util.tree_map(lambda v: v, variables)  # copy
    dense_out = variables["params"]["Dense_1"]
    dense_out["kernel"] = dense_out["kernel"] * 1e6
    y = model.apply(variables, x, train=False)
    assert y.shape == (2, 1)
    in_01 = bool(jnp.all((y >= 0) & (y <= 1)))
    assert in_01 == (not relativistic)


def test_discriminator_train_updates_bn_stats():
    model = Discriminator(dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 32, 32, 3)), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=True)
    _, mutated = model.apply(variables, x, train=True, mutable=["batch_stats"])
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))


def test_bf16_compute_f32_params():
    model = SRResNet(upsample_factor=2, num_res_blocks=1, dtype=jnp.bfloat16)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
    for leaf in jax.tree_util.tree_leaves(variables["params"]):
        assert leaf.dtype == jnp.float32
    y = model.apply(variables, jnp.zeros((1, 8, 8, 3)))
    assert y.dtype == jnp.float32  # output contract stays f32


def test_rrdb_growth_channels_roundtrip(tmp_path):
    """growth_channels shapes the dense convs and survives save/load."""
    import jax
    from simplesr_tpu.models import RRDBNet
    from simplesr_tpu.train import Generator
    from simplesr_tpu.train.serialization import save_model, load_model

    m = RRDBNet(upsample_factor=2, num_filters=16, num_rrdb_blocks=1,
                growth_channels=16)
    v = m.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
    dense0 = v["params"]["RRDBBlock_0"]["DenseBlock_0"]
    assert dense0["Conv_0"]["kernel"].shape[-1] == 16  # not nf//2=8

    gen = Generator.rrdb(upsample_factor=2, num_blocks=1, num_filters=16,
                         growth_channels=16, input_dims=(8, 8))
    path = str(tmp_path / "g.msgpack")
    save_model(gen.module_config(), gen.variables, path)
    module, _ = load_model(path)
    assert module.growth_channels == 16

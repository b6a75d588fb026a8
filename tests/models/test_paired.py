"""Exactness tests for the batch→channel paired trunk (models/paired.py).

The rewrite packs `ways` batch items into channels with block-diagonal
trunk kernels (ops/pairing.py) — an MXU-lane-fill lowering that must be
mathematically identical to the trained SRResNet (reference parity path,
model_builder.py:99-134). These tests pin the pack/unpack layout, the
block-diagonal expansion, full-model equivalence (plain and composed with
the polyphase tail), and the parameter-tree contract.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax import lax

from simplesr_tpu.models import SRResNet
from simplesr_tpu.models.paired import (SRResNetPaired,
                                        SRResNetPairedPolyphase,
                                        paired_model, paired_variables)
from simplesr_tpu.ops.pairing import (blockdiag_kernel,
                                      blockdiag_kernel_segmented, pack_batch,
                                      pair_param_tree, unpack_batch)


def test_pack_unpack_roundtrip_and_layout():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(6, 4, 5, 3)), jnp.float32)
    packed = pack_batch(x, 3)
    assert packed.shape == (2, 4, 5, 9)
    # group i, channel block j == batch item 3i+j
    for i in range(2):
        for j in range(3):
            np.testing.assert_array_equal(
                np.asarray(packed[i, :, :, 3 * j:3 * (j + 1)]),
                np.asarray(x[3 * i + j]))
    np.testing.assert_array_equal(np.asarray(unpack_batch(packed, 3)),
                                  np.asarray(x))


def test_pack_rejects_indivisible_batch():
    x = jnp.zeros((5, 4, 4, 3))
    with pytest.raises(ValueError):
        pack_batch(x, 2)


def test_blockdiag_conv_equals_per_stream_conv():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 6, 6, 5)), jnp.float32)
    k = rng.normal(size=(3, 3, 5, 7)).astype(np.float32)

    def conv(x, k):
        return lax.conv_general_dilated(
            x, jnp.asarray(k), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    per_stream = conv(x, k)
    packed = conv(pack_batch(x, 2), blockdiag_kernel(k, 2))
    np.testing.assert_allclose(np.asarray(unpack_batch(packed, 2)),
                               np.asarray(per_stream), atol=1e-5, rtol=1e-5)


def test_pair_param_tree_shapes_and_values():
    tree = {"Conv_0": {"kernel": np.arange(36, dtype=np.float32).reshape(3, 3, 2, 2),
                       "bias": np.array([1.0, 2.0], np.float32)}}
    out = pair_param_tree(tree, 2)
    k = np.asarray(out["Conv_0"]["kernel"])
    assert k.shape == (3, 3, 4, 4)
    np.testing.assert_array_equal(k[:, :, :2, :2], tree["Conv_0"]["kernel"])
    np.testing.assert_array_equal(k[:, :, 2:, 2:], tree["Conv_0"]["kernel"])
    assert not k[:, :, :2, 2:].any() and not k[:, :, 2:, :2].any()
    np.testing.assert_array_equal(np.asarray(out["Conv_0"]["bias"]),
                                  [1.0, 2.0, 1.0, 2.0])
    with pytest.raises(ValueError):
        pair_param_tree({"x": np.zeros((2, 2))}, 2)


def _rand_variables(variables, seed=0):
    """Random params/stats so the equivalence exercises non-zero PReLU
    alphas, biases, and BN statistics (same scheme as test_polyphase)."""
    leaves, treedef = jax.tree.flatten(variables)
    rng = np.random.default_rng(seed)
    new = [jnp.asarray(rng.normal(0, 0.3, l.shape), l.dtype) +
           (jnp.abs(jnp.asarray(rng.normal(1, 0.1, l.shape), l.dtype))
            if l.ndim == 1 else 0.0)
           for l in leaves]
    return jax.tree.unflatten(treedef, new)


@pytest.mark.parametrize("scale,batch_norm,ways", [(2, True, 2), (4, True, 2),
                                                   (4, False, 4), (8, False, 2)])
def test_model_equivalence_f32(scale, batch_norm, ways):
    model = SRResNet(upsample_factor=scale, num_filters=8, num_res_blocks=2,
                     batch_norm=batch_norm, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (ways * 2, 6, 6, 3)),
                    jnp.float32)
    variables = _rand_variables(model.init(jax.random.key(0), x[:1]))
    ref = model.apply(variables, x, train=False)

    for polyphase in (False, True):
        paired, pvars = paired_model(model, variables, ways=ways,
                                     polyphase=polyphase)
        out = paired.apply(pvars, x, train=False)
        assert out.shape == ref.shape == (ways * 2, 6 * scale, 6 * scale, 3)
        # identical dot products in a `ways`-fold larger contraction: f32
        # reassociation noise only (grows with ways; 4-way measures ~4e-3
        # worst-case on the random-BN-scaled pre-tanh values)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-3, rtol=5e-3)


def test_param_tree_matches_module_init():
    """Converted variables must exactly fit the paired modules' own trees
    (shape + dtype), so apply() can never silently broadcast."""
    model = SRResNet(upsample_factor=4, num_filters=8, num_res_blocks=1,
                     dtype=jnp.float32)
    x = jnp.zeros((2, 6, 6, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x[:1])
    for polyphase in (False, True):
        paired, pvars = paired_model(model, variables, ways=2,
                                     polyphase=polyphase)
        assert type(paired) is (SRResNetPairedPolyphase if polyphase
                                else SRResNetPaired)
        native = paired.init(jax.random.key(0), x)
        native_shapes = jax.tree.map(lambda l: (l.shape, l.dtype), native)
        conv_shapes = jax.tree.map(lambda l: (l.shape, l.dtype), pvars)
        assert jax.tree.all(jax.tree.map(lambda a, b: a == b,
                                         native_shapes, conv_shapes))


def test_bf16_model_close():
    """Default bf16 policy: packed streams see the same bf16 values per op;
    only accumulation order differs."""
    model = SRResNet(upsample_factor=4, num_filters=16, num_res_blocks=2,
                     dtype=jnp.bfloat16)
    x = jnp.asarray(np.random.default_rng(2).uniform(0, 1, (4, 8, 8, 3)),
                    jnp.float32)
    variables = model.init(jax.random.key(3), x[:1])
    ref = model.apply(variables, x, train=False)
    paired, pvars = paired_model(model, variables, ways=2)
    out = paired.apply(pvars, x, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=0.05, rtol=0.05)


def test_paired_rejects_train_and_wrong_types():
    model = SRResNet(upsample_factor=2, num_filters=8, num_res_blocks=1,
                     dtype=jnp.float32)
    x = jnp.zeros((2, 6, 6, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x[:1])
    paired, pvars = paired_model(model, variables, ways=2)
    with pytest.raises(ValueError):
        paired.apply(pvars, x, train=True,
                     mutable=["batch_stats"])
    from simplesr_tpu.models import RRDBNet
    with pytest.raises(TypeError):
        paired_model(RRDBNet(upsample_factor=2, num_filters=8), {})


def test_blockdiag_segmented_routes_concat_streams():
    """Per-stream conv over a concat of two packed tensors == segmented
    block-diagonal conv over the packed concat."""
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.normal(size=(4, 5, 5, 6)), jnp.float32)   # seg 6
    b = jnp.asarray(rng.normal(size=(4, 5, 5, 2)), jnp.float32)   # seg 2
    k = rng.normal(size=(3, 3, 8, 4)).astype(np.float32)

    def conv(x, kk):
        return lax.conv_general_dilated(
            x, jnp.asarray(kk), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    per_stream = conv(jnp.concatenate([a, b], -1), k)
    packed_in = jnp.concatenate([pack_batch(a, 2), pack_batch(b, 2)], -1)
    packed = conv(packed_in, blockdiag_kernel_segmented(k, 2, [6, 2]))
    np.testing.assert_allclose(np.asarray(unpack_batch(packed, 2)),
                               np.asarray(per_stream), atol=1e-5, rtol=1e-5)
    with pytest.raises(ValueError):
        blockdiag_kernel_segmented(k, 2, [6, 3])


@pytest.mark.parametrize("scale,ways,growth", [(2, 2, None), (4, 2, None),
                                               (4, 4, None), (4, 2, 16)])
def test_rrdb_model_equivalence_f32(scale, ways, growth):
    from simplesr_tpu.models import RRDBNet
    from simplesr_tpu.models.paired import rrdb_paired_model

    model = RRDBNet(upsample_factor=scale, num_filters=8, num_rrdb_blocks=2,
                    num_dense_blocks=2, num_convs=3, dtype=jnp.float32,
                    growth_channels=growth)
    x = jnp.asarray(np.random.default_rng(7).uniform(0, 1, (ways * 2, 6, 6, 3)),
                    jnp.float32)
    variables = _rand_variables(model.init(jax.random.key(8), x[:1]), seed=8)
    ref = model.apply(variables, x, train=False)

    paired, pvars = rrdb_paired_model(model, variables, ways=ways)
    out = paired.apply(pvars, x, train=False)
    assert out.shape == ref.shape == (ways * 2, 6 * scale, 6 * scale, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-3, rtol=5e-3)


def test_rrdb_paired_param_tree_matches_module_init():
    from simplesr_tpu.models import RRDBNet
    from simplesr_tpu.models.paired import rrdb_paired_model

    model = RRDBNet(upsample_factor=4, num_filters=8, num_rrdb_blocks=1,
                    num_dense_blocks=1, num_convs=2, dtype=jnp.float32)
    x = jnp.zeros((2, 6, 6, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x[:1])
    paired, pvars = rrdb_paired_model(model, variables, ways=2)
    native = paired.init(jax.random.key(0), x)
    native_shapes = jax.tree.map(lambda l: (l.shape, l.dtype), native)
    conv_shapes = jax.tree.map(lambda l: (l.shape, l.dtype), pvars)
    assert jax.tree.all(jax.tree.map(lambda a, b: a == b,
                                     native_shapes, conv_shapes))


def test_rrdb_paired_rejects_non_rrdb():
    from simplesr_tpu.models.paired import rrdb_paired_model
    model = SRResNet(upsample_factor=2, num_filters=8, num_res_blocks=1)
    with pytest.raises(TypeError):
        rrdb_paired_model(model, {})


def test_indivisible_batch_raises_at_apply():
    model = SRResNet(upsample_factor=2, num_filters=8, num_res_blocks=1,
                     dtype=jnp.float32)
    x = jnp.zeros((3, 6, 6, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x[:1])
    paired, pvars = paired_model(model, variables, ways=2)
    with pytest.raises(ValueError):
        paired.apply(pvars, x, train=False)

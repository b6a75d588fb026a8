"""Exactness tests for the polyphase inference tail (models/polyphase.py).

The rewrite must be *mathematically identical* to the trained SRResNet tail
(reference parity path, model_builder.py:132-134,275-282) — these tests pin
the weight-space transform at every level: single conv, phase-merge
permutation, and the full model in f32.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax import lax

from simplesr_tpu.models import SRResNet
from simplesr_tpu.models.polyphase import (SRResNetPolyphase,
                                           polyphase_model,
                                           polyphase_variables)
from simplesr_tpu.ops.polyphase import (coarse_kernel_taps,
                                        coarsen_conv_kernel,
                                        phase_merge_permutation, tile_phase)
from simplesr_tpu.ops.shuffle import depth_to_space, space_to_depth


def _conv(x, w, b=None):
    y = lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y if b is None else y + b


@pytest.mark.parametrize("k,s", [(3, 1), (3, 2), (3, 4), (9, 2), (9, 4), (5, 2)])
def test_coarsen_conv_kernel_exact(k, s):
    rng = np.random.default_rng(k * 10 + s)
    cin, cout = 3, 5
    U = jnp.asarray(rng.normal(size=(2, 6, 6, s * s * cin)), jnp.float32)
    K = rng.normal(size=(k, k, cin, cout)).astype(np.float32)
    b = rng.normal(size=(cout,)).astype(np.float32)

    fine = _conv(depth_to_space(U, s), jnp.asarray(K), jnp.asarray(b))

    Kc, bc = coarsen_conv_kernel(K, s, b)
    assert Kc.shape[0] == coarse_kernel_taps(k, s)
    coarse = _conv(U, jnp.asarray(Kc), jnp.asarray(bc))

    np.testing.assert_allclose(np.asarray(depth_to_space(coarse, s)),
                               np.asarray(fine), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("s,u,c", [(1, 2, 3), (2, 2, 4), (4, 2, 2), (2, 4, 3)])
def test_phase_merge_permutation(s, u, c):
    rng = np.random.default_rng(s * 100 + u * 10 + c)
    V = jnp.asarray(rng.normal(size=(1, 5, 5, s * s * u * u * c)), jnp.float32)
    # nested: d2s(s) exposes per-pixel u^2*c channels, then d2s(u)
    nested = depth_to_space(depth_to_space(V, s), u)
    direct = depth_to_space(V[..., phase_merge_permutation(s, u, c)], s * u)
    np.testing.assert_array_equal(np.asarray(nested), np.asarray(direct))


def test_tile_phase_matches_d2s_broadcast():
    # PReLU(alpha) after d2s(s) == coarse PReLU with phase-tiled alpha
    rng = np.random.default_rng(0)
    s, c = 2, 4
    U = jnp.asarray(rng.normal(size=(1, 3, 3, s * s * c)), jnp.float32)
    alpha = rng.uniform(0.1, 0.9, size=(c,)).astype(np.float32)

    def prelu(x, a):
        return jnp.where(x >= 0, x, a * x)

    fine = prelu(depth_to_space(U, s), jnp.asarray(alpha))
    coarse = depth_to_space(prelu(U, jnp.asarray(tile_phase(alpha, s))), s)
    np.testing.assert_array_equal(np.asarray(fine), np.asarray(coarse))


def _rand_variables(variables, seed=0):
    """Replace init params/stats with random values so the equivalence test
    exercises real (non-zero) PReLU alphas, biases, and BN statistics."""
    leaves, treedef = jax.tree.flatten(variables)
    rng = np.random.default_rng(seed)
    new = [jnp.asarray(rng.normal(0, 0.3, l.shape), l.dtype) +
           (jnp.abs(jnp.asarray(rng.normal(1, 0.1, l.shape), l.dtype))
            if l.ndim == 1 else 0.0)
           for l in leaves]
    return jax.tree.unflatten(treedef, new)


@pytest.mark.parametrize("scale,batch_norm", [(2, True), (4, True), (4, False),
                                              (8, False)])
def test_model_equivalence_f32(scale, batch_norm):
    model = SRResNet(upsample_factor=scale, num_filters=8, num_res_blocks=2,
                     batch_norm=batch_norm, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (2, 6, 6, 3)),
                    jnp.float32)
    variables = _rand_variables(model.init(jax.random.key(0), x))

    ref = model.apply(variables, x, train=False)
    poly, pvars = polyphase_model(model, variables)
    out = poly.apply(pvars, x, train=False)

    assert out.shape == ref.shape == (2, 6 * scale, 6 * scale, 3)
    # identical dot products in a different accumulation order: f32
    # reassociation noise only (the conv-level tests above pin 1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-3, rtol=1e-3)


def test_polyphase_param_tree_matches_module_init():
    """Converted variables must exactly fit SRResNetPolyphase's own tree
    (shape + dtype), so apply() can never silently broadcast."""
    model = SRResNet(upsample_factor=4, num_filters=8, num_res_blocks=1,
                     dtype=jnp.float32)
    x = jnp.zeros((1, 6, 6, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    poly, pvars = polyphase_model(model, variables)
    native = poly.init(jax.random.key(0), x)

    native_shapes = jax.tree.map(lambda l: (l.shape, l.dtype), native)
    conv_shapes = jax.tree.map(lambda l: (l.shape, l.dtype), pvars)
    assert jax.tree.all(jax.tree.map(lambda a, b: a == b,
                                     native_shapes, conv_shapes))


def test_out_dtype_bf16_close_and_f32_param_tree():
    """out_dtype=bfloat16 computes the coarse output conv in bf16 (MXU f32
    accumulation): outputs must stay within bf16 rounding of the f32 path
    and the param tree must be unchanged (cast at apply, not in storage)."""
    model = SRResNet(upsample_factor=4, num_filters=8, num_res_blocks=1,
                     dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(9).uniform(0, 1, (1, 8, 8, 3)),
                    jnp.float32)
    variables = model.init(jax.random.key(9), x)
    ref = model.apply(variables, x, train=False)
    poly, pvars = polyphase_model(model, variables, out_dtype=jnp.bfloat16)
    out = poly.apply(pvars, x, train=False)
    assert out.dtype == jnp.float32
    assert pvars["params"]["PolyOut"]["kernel"].dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-3)


def test_polyphase_rejects_non_srresnet():
    from simplesr_tpu.models import RRDBNet
    m = RRDBNet(upsample_factor=4, num_filters=8)
    with pytest.raises(TypeError):
        polyphase_model(m, {})


@pytest.mark.parametrize("scale,mode", [(2, "up"), (2, "full"), (4, "up"),
                                        (4, "2phase"), (4, "full"),
                                        (8, "2phase")])
def test_rrdb_model_equivalence_f32(scale, mode):
    from simplesr_tpu.models import RRDBNet
    from simplesr_tpu.models.polyphase import rrdb_polyphase_model

    model = RRDBNet(upsample_factor=scale, num_filters=8, num_rrdb_blocks=1,
                    num_dense_blocks=1, num_convs=2, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(7).uniform(0, 1, (2, 6, 6, 3)),
                    jnp.float32)
    variables = _rand_variables(model.init(jax.random.key(8), x), seed=8)

    ref = model.apply(variables, x, train=False)
    poly, pvars = rrdb_polyphase_model(model, variables, mode=mode)
    out = poly.apply(pvars, x, train=False)

    assert out.shape == ref.shape == (2, 6 * scale, 6 * scale, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-3, rtol=1e-3)


def test_rrdb_polyphase_param_tree_matches_module_init():
    from simplesr_tpu.models import RRDBNet
    from simplesr_tpu.models.polyphase import rrdb_polyphase_model

    model = RRDBNet(upsample_factor=4, num_filters=8, num_rrdb_blocks=1,
                    num_dense_blocks=1, num_convs=2, dtype=jnp.float32)
    x = jnp.zeros((1, 6, 6, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    for mode in ("up", "2phase", "full"):
        poly, pvars = rrdb_polyphase_model(model, variables, mode=mode)
        native = poly.init(jax.random.key(0), x)
        native_shapes = jax.tree.map(lambda l: (l.shape, l.dtype), native)
        conv_shapes = jax.tree.map(lambda l: (l.shape, l.dtype), pvars)
        assert jax.tree.all(jax.tree.map(lambda a, b: a == b,
                                         native_shapes, conv_shapes)), mode


def test_as_predictor_serving_path_matches(tmp_path):
    """The serving/eval predictor silently reparameterizes saved SRResNets
    (evaluation._as_predictor -> fast_inference); output must match the
    training-form model on the same weights."""
    from simplesr_tpu.eval.evaluation import _as_predictor
    from simplesr_tpu.train import serialization

    model = SRResNet(upsample_factor=2, num_filters=8, num_res_blocks=1,
                     dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(5).uniform(0, 1, (1, 6, 6, 3)),
                    jnp.float32)
    variables = _rand_variables(model.init(jax.random.key(4), x), seed=4)
    path = str(tmp_path / "gen.msgpack")
    serialization.save_model(
        {"upsample_factor": 2, "architecture": "srresnet", "num_blocks": 1,
         "num_filters": 8, "dtype": "float32"}, variables, path)

    ref = model.apply(variables, x, train=False)
    out = _as_predictor(path)(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-3, rtol=1e-3)


def test_bf16_model_close():
    """bf16 tail: same dot products in a different summation order — outputs
    must agree to bf16 resolution."""
    model = SRResNet(upsample_factor=4, num_filters=16, num_res_blocks=2,
                     dtype=jnp.bfloat16)
    x = jnp.asarray(np.random.default_rng(2).uniform(0, 1, (1, 8, 8, 3)),
                    jnp.float32)
    variables = model.init(jax.random.key(3), x)
    ref = model.apply(variables, x, train=False)
    poly, pvars = polyphase_model(model, variables)
    out = poly.apply(pvars, x, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=0.05, rtol=0.05)


def test_rrdb_polyphase_exact_with_growth_channels(rng):
    """growth_channels (the lane-filled dense width) must survive the
    polyphase rewrite exactly, like the default topology."""
    from simplesr_tpu.models import RRDBNet
    from simplesr_tpu.models.polyphase import rrdb_polyphase_model

    model = RRDBNet(upsample_factor=2, num_filters=16, num_rrdb_blocks=1,
                    growth_channels=16, dtype=jnp.float32)
    x = jnp.asarray(rng.uniform(0, 1, (1, 8, 8, 3)), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    base = np.asarray(model.apply(variables, x, train=False), np.float32)
    poly, pvars = rrdb_polyphase_model(model, variables, mode="up")
    assert poly.growth_channels == 16
    out = np.asarray(poly.apply(pvars, x, train=False), np.float32)
    np.testing.assert_allclose(out, base, atol=2e-6)

"""Pipeline-parallel (GPipe staged-trunk) forward must reproduce the
single-device SRResNet forward bit-for-tolerance on the UNCHANGED parameter
tree, for every microbatch count, and stay differentiable through the
fill-and-drain schedule."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from simplesr_tpu.models import SRResNet
from simplesr_tpu.parallel import make_mesh, pipeline_apply, STAGE_AXIS


def _model(**kw):
    kw.setdefault("upsample_factor", 2)
    kw.setdefault("num_filters", 8)
    kw.setdefault("num_res_blocks", 8)
    return SRResNet(batch_norm=False, dtype=jnp.float32, **kw)


@pytest.fixture(scope="module")
def trained():
    model = _model()
    variables = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
    return model, variables["params"]


@pytest.mark.parametrize("n_stages,microbatches", [(4, 4), (4, 2), (8, 4)])
def test_pipeline_matches_single_device(trained, rng, n_stages, microbatches):
    model, params = trained
    x = jnp.asarray(rng.uniform(0, 1, (4, 10, 10, 3)), jnp.float32)
    ref = model.apply({"params": params}, x, train=False)

    mesh = make_mesh({STAGE_AXIS: n_stages}, devices=jax.devices()[:n_stages])
    out = jax.jit(pipeline_apply(model, mesh, microbatches))(params, x)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_pipeline_single_microbatch_degenerates_to_sequential(trained, rng):
    model, params = trained
    x = jnp.asarray(rng.uniform(0, 1, (2, 8, 8, 3)), jnp.float32)
    mesh = make_mesh({STAGE_AXIS: 2}, devices=jax.devices()[:2])
    out = jax.jit(pipeline_apply(model, mesh, 1))(params, x)
    ref = model.apply({"params": params}, x, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_pipeline_gradients_match(trained, rng):
    """ppermute + the scan schedule have exact transposes — pipeline
    training gradients equal the sequential ones."""
    model, params = trained
    x = jnp.asarray(rng.uniform(0, 1, (4, 8, 8, 3)), jnp.float32)
    mesh = make_mesh({STAGE_AXIS: 4}, devices=jax.devices()[:4])
    f = pipeline_apply(model, mesh, 2)

    g_ref = jax.grad(lambda p: jnp.mean(
        model.apply({"params": p}, x, train=False) ** 2))(params)
    g_pp = jax.grad(lambda p: jnp.mean(f(p, x) ** 2))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_pp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-7)


def test_pipeline_rejects_bad_configs(trained):
    model, params = trained
    mesh = make_mesh({STAGE_AXIS: 8})
    with pytest.raises(ValueError, match="divisible"):
        pipeline_apply(_model(num_res_blocks=6), mesh, 2)
    with pytest.raises(ValueError, match="batch_norm"):
        pipeline_apply(SRResNet(upsample_factor=2, num_filters=8,
                                num_res_blocks=8, batch_norm=True), mesh, 2)
    f = pipeline_apply(model, mesh, 3)
    with pytest.raises(ValueError, match="not divisible by microbatches"):
        f(params, jnp.zeros((4, 8, 8, 3)))

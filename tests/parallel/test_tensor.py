"""Tensor-parallel (Megatron channel-split) forward must reproduce the
single-device SRResNet — and all-column-parallel RRDB — forward and
gradients on the UNCHANGED parameter tree, alone and composed with a data
axis (dp×tp)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from simplesr_tpu.models import SRResNet
from simplesr_tpu.models.rrdb import RRDBNet
from simplesr_tpu.parallel import make_mesh, tp_apply, MODEL_AXIS, DATA_AXIS


def _model(**kw):
    kw.setdefault("upsample_factor", 4)
    kw.setdefault("num_filters", 16)
    kw.setdefault("num_res_blocks", 3)
    return SRResNet(batch_norm=False, dtype=jnp.float32, **kw)


@pytest.fixture(scope="module")
def trained():
    model = _model()
    variables = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
    return model, variables["params"]


def test_tp_matches_single_device(trained, rng):
    model, params = trained
    x = jnp.asarray(rng.uniform(0, 1, (2, 12, 12, 3)), jnp.float32)
    ref = model.apply({"params": params}, x, train=False)

    mesh = make_mesh({MODEL_AXIS: 8})
    out = jax.jit(tp_apply(model, mesh))(params, x)
    assert out.shape == ref.shape == (2, 48, 48, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_tp_composes_with_data_axis(trained, rng):
    """2-D dp×tp mesh: batch sharded over 'data', channels over 'model' —
    the serving/training shape for one model split across a slice."""
    model, params = trained
    x = jnp.asarray(rng.uniform(0, 1, (4, 12, 12, 3)), jnp.float32)
    ref = model.apply({"params": params}, x, train=False)

    mesh = make_mesh({DATA_AXIS: 2, MODEL_AXIS: 4})
    out = jax.jit(tp_apply(model, mesh, batch_axis=DATA_AXIS))(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_tp_gradients_match(trained, rng):
    """psum/collectives have exact transposes — a TP training step sees the
    same gradients as the single-device step."""
    model, params = trained
    x = jnp.asarray(rng.uniform(0, 1, (2, 8, 8, 3)), jnp.float32)
    mesh = make_mesh({MODEL_AXIS: 4}, devices=jax.devices()[:4])
    f = tp_apply(model, mesh)

    g_ref = jax.grad(lambda p: jnp.mean(
        model.apply({"params": p}, x, train=False) ** 2))(params)
    g_tp = jax.grad(lambda p: jnp.mean(f(p, x) ** 2))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_tp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_tp_rejects_bad_configs():
    mesh = make_mesh({MODEL_AXIS: 8})
    with pytest.raises(ValueError, match="divisible"):
        tp_apply(_model(num_filters=12), mesh)
    with pytest.raises(ValueError, match="batch_norm"):
        tp_apply(SRResNet(upsample_factor=2, num_filters=16, num_res_blocks=1,
                          batch_norm=True), mesh)


# ----------------------------------------------------------------- RRDB TP

def _rrdb(**kw):
    kw.setdefault("upsample_factor", 4)
    kw.setdefault("num_filters", 16)
    kw.setdefault("num_rrdb_blocks", 2)
    kw.setdefault("num_dense_blocks", 2)
    kw.setdefault("num_convs", 3)
    return RRDBNet(dtype=jnp.float32, **kw)


@pytest.fixture(scope="module")
def trained_rrdb():
    model = _rrdb()
    variables = model.init(jax.random.key(1), jnp.zeros((1, 8, 8, 3)))
    return model, variables["params"]


def test_rrdb_tp_matches_single_device(trained_rrdb, rng):
    model, params = trained_rrdb
    x = jnp.asarray(rng.uniform(0, 1, (2, 12, 12, 3)), jnp.float32)
    ref = model.apply({"params": params}, x, train=False)

    mesh = make_mesh({MODEL_AXIS: 8})
    out = jax.jit(tp_apply(model, mesh))(params, x)
    assert out.shape == ref.shape == (2, 48, 48, 3)
    # all-column-parallel: every output channel is computed whole on one
    # device — the same reduction order as single-device
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_rrdb_tp_composes_with_data_axis(trained_rrdb, rng):
    model, params = trained_rrdb
    x = jnp.asarray(rng.uniform(0, 1, (4, 12, 12, 3)), jnp.float32)
    ref = model.apply({"params": params}, x, train=False)

    mesh = make_mesh({DATA_AXIS: 2, MODEL_AXIS: 4})
    out = jax.jit(tp_apply(model, mesh, batch_axis=DATA_AXIS))(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_rrdb_tp_gradients_match(trained_rrdb, rng):
    model, params = trained_rrdb
    x = jnp.asarray(rng.uniform(0, 1, (2, 8, 8, 3)), jnp.float32)
    mesh = make_mesh({MODEL_AXIS: 4}, devices=jax.devices()[:4])
    f = tp_apply(model, mesh)

    g_ref = jax.grad(lambda p: jnp.mean(
        model.apply({"params": p}, x, train=False) ** 2))(params)
    g_tp = jax.grad(lambda p: jnp.mean(f(p, x) ** 2))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_tp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_rrdb_tp_wide_variant_and_rejects():
    # the lane-filled production shape (growth=num_filters) shards cleanly
    model = _rrdb(num_filters=16, growth_channels=16, num_rrdb_blocks=1)
    variables = model.init(jax.random.key(2), jnp.zeros((1, 8, 8, 3)))
    mesh = make_mesh({MODEL_AXIS: 8})
    out = jax.jit(tp_apply(model, mesh))(
        variables["params"], jnp.zeros((1, 8, 8, 3), jnp.float32))
    assert out.shape == (1, 32, 32, 3)

    with pytest.raises(ValueError, match="growth width"):
        # growth = 20/2 = 10, not divisible by 4
        tp_apply(_rrdb(num_filters=20, growth_channels=10),
                 make_mesh({MODEL_AXIS: 4}, devices=jax.devices()[:4]))

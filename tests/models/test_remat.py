"""Rematerialized (jax.checkpoint) trunks must be exact rewrites.

`remat=True` wraps each trunk block in nn.remat so the backward pass
recomputes block activations instead of storing them — an HBM⇄FLOPs trade
that is numerically equivalent up to float reassociation (jax.checkpoint
re-fuses both primal and backward). These tests pin: identical parameter
trees (saved models move freely between remat settings), forwards and
gradients equal to f32 roundoff, and that the remat primitive actually lands in the
backward jaxpr (i.e. the flag is not a silent no-op).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simplesr_tpu.models import RRDBNet, SRResNet


def _tree_spec(variables):
    return [(p, l.shape, l.dtype)
            for p, l in jax.tree_util.tree_flatten_with_path(variables)[0]]


def _grads(model, variables, lr, hr, train):
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}

    def loss(p):
        out = model.apply({"params": p, **rest}, lr, train=train,
                          **({"mutable": ["batch_stats"]} if rest else {}))
        sr = out[0] if rest else out
        return jnp.mean((sr - hr) ** 2)

    return jax.grad(loss)(params)


@pytest.mark.parametrize("batch_norm", [False, True])
def test_srresnet_remat_exact(batch_norm):
    lr = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (2, 12, 12, 3)),
                     jnp.float32)
    hr = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (2, 48, 48, 3)),
                     jnp.float32)
    # grads compare in f32 compute: remat re-orders backward fusions, which
    # shifts bf16 accumulation at ~1e-2 relative — not a correctness signal
    kw = dict(upsample_factor=4, num_res_blocks=3, num_filters=8,
              batch_norm=batch_norm, dtype=jnp.float32)
    plain = SRResNet(**kw)
    remat = SRResNet(**kw, remat=True)
    variables = plain.init(jax.random.key(0), lr, train=False)

    # identical parameter tree: init under remat produces the same names
    assert _tree_spec(remat.init(jax.random.key(0), lr, train=False)) == \
        _tree_spec(variables)

    # forward: equal to roundoff in both modes (checkpoint re-fuses the primal)
    for train in (False, True):
        a = plain.apply(variables, lr, train=train,
                        **({"mutable": ["batch_stats"]} if train and batch_norm else {}))
        b = remat.apply(variables, lr, train=train,
                        **({"mutable": ["batch_stats"]} if train and batch_norm else {}))
        if train and batch_norm:
            a, b = a[0], b[0]
        # checkpoint re-fuses even the primal, so compare to f32-roundoff
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=1e-5, atol=1e-5)

    ga = _grads(plain, variables, lr, hr, train=batch_norm)
    gb = _grads(remat, variables, lr, hr, train=batch_norm)
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_allclose(
            np.asarray(x, np.float32), np.asarray(y, np.float32),
            rtol=1e-4, atol=1e-5), ga, gb)


def test_rrdb_remat_exact():
    lr = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (2, 10, 10, 3)),
                     jnp.float32)
    hr = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (2, 40, 40, 3)),
                     jnp.float32)
    kw = dict(upsample_factor=4, num_rrdb_blocks=2, num_filters=8)
    plain = RRDBNet(**kw)
    remat = RRDBNet(**kw, remat=True)
    variables = plain.init(jax.random.key(0), lr)

    assert _tree_spec(remat.init(jax.random.key(0), lr)) == _tree_spec(variables)
    np.testing.assert_allclose(
        np.asarray(plain.apply(variables, lr), np.float32),
        np.asarray(remat.apply(variables, lr), np.float32),
        rtol=1e-5, atol=1e-5)

    ga = _grads(plain, variables, lr, hr, False)
    gb = _grads(remat, variables, lr, hr, False)
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_allclose(
            np.asarray(x, np.float32), np.asarray(y, np.float32),
            rtol=1e-4, atol=1e-5), ga, gb)


def test_remat_actually_in_backward():
    """The flag must land jax.checkpoint in the grad computation — guard
    against nn.remat silently composing into a no-op."""
    lr = jnp.zeros((1, 8, 8, 3), jnp.float32)
    hr = jnp.zeros((1, 32, 32, 3), jnp.float32)

    def jaxpr_of(model, variables):
        def loss(p):
            sr = model.apply({"params": p}, lr, train=False)
            return jnp.mean((sr - hr) ** 2)
        return str(jax.make_jaxpr(jax.grad(loss))(variables["params"]))

    kw = dict(upsample_factor=4, num_rrdb_blocks=1, num_filters=8)
    v = RRDBNet(**kw).init(jax.random.key(0), lr)
    assert "remat" in jaxpr_of(RRDBNet(**kw, remat=True), v)
    assert "remat" not in jaxpr_of(RRDBNet(**kw), v)


def test_remat_round_trips_through_model_files(tmp_path):
    """Generator(remat=True) → save_model → load_model rebuilds the module
    with remat on (module_config carries the flag)."""
    from simplesr_tpu.train import Generator, serialization

    gen = Generator.rrdb(upsample_factor=2, num_blocks=1, num_filters=8,
                         input_dims=(8, 8), remat=True)
    assert gen.model().remat
    path = str(tmp_path / ("m" + serialization.MODEL_EXT))
    serialization.save_model(gen.module_config(), gen.variables, path)
    module, variables = serialization.load_model(path)
    assert module.remat
    lr = jnp.zeros((1, 8, 8, 3), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(module.apply(variables, lr)),
        np.asarray(gen.model().apply(gen.variables, lr)))

"""Keras `.h5` exporter, with the REFERENCE as the oracle in both roles:
export a flax-initialized model, load the `.h5` back with legacy Keras the
way the reference's evaluation does (operations/evaluation.py:322-328), and
require numerical output agreement — plus an import(export(m)) round-trip
through `tools/import_keras.py` that must reproduce the tree exactly."""

import os

import numpy as np
import pytest

pytest.importorskip("h5py")

os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

REFERENCE = "/root/reference"


def _save_random_model(tmp_path, rng, **config):
    """Init a flax generator with random (non-degenerate) weights and save
    the .msgpack model file; returns (path, config, variables)."""
    import jax
    import jax.numpy as jnp
    from simplesr_tpu.models import build_generator_model
    from simplesr_tpu.train import serialization

    module = build_generator_model(**config, dtype=jnp.float32)
    variables = module.init(jax.random.key(int(rng.integers(1 << 30))),
                            jnp.zeros((1, 8, 8, 3), jnp.float32),
                            train=False)
    # nudge BN stats off their init so the export carries real statistics
    if "batch_stats" in variables:
        variables = jax.tree_util.tree_map_with_path(
            lambda p, x: x + 0.1 if "batch_stats" in str(p[0]) else x,
            dict(variables))
    path = str(tmp_path / "model.msgpack")
    serialization.save_model(config, variables, path)
    return path, config, variables


def _flax_predict(config, variables, x):
    import jax.numpy as jnp
    from simplesr_tpu.models import build_generator_model
    module = build_generator_model(**config, dtype=jnp.float32)
    return np.asarray(module.apply(variables, jnp.asarray(x), train=False))


def _load_h5_predict(h5, x):
    """Load the exported file exactly the way the reference's evaluation
    does and run inference."""
    import tf_keras
    model = tf_keras.models.load_model(h5, compile=False)
    return np.asarray(model(x, training=False))


@pytest.mark.parametrize("batch_norm", [True, False])
def test_srresnet_export_matches_flax(tmp_path, rng, batch_norm):
    path, config, variables = _save_random_model(
        tmp_path, rng, upsample_factor=2, architecture="srresnet",
        num_blocks=2, num_filters=8, batch_norm=batch_norm)

    from simplesr_tpu.tools.export_keras import export_keras_model
    h5 = str(tmp_path / "gen.h5")
    export_keras_model(path, h5, reference=REFERENCE)

    x = rng.uniform(0, 1, (2, 12, 12, 3)).astype(np.float32)
    want = _flax_predict(config, variables, x)
    got = _load_h5_predict(h5, x)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_rrdb_export_matches_flax(tmp_path, rng):
    path, config, variables = _save_random_model(
        tmp_path, rng, upsample_factor=4, architecture="rrdb",
        num_blocks=2, num_dense_blocks=2, num_convs=3, num_filters=8,
        residual_scaling=0.2, batch_norm=False)

    from simplesr_tpu.tools.export_keras import export_keras_model
    h5 = str(tmp_path / "rrdb.h5")
    export_keras_model(path, h5, reference=REFERENCE)

    x = rng.uniform(0, 1, (1, 10, 10, 3)).astype(np.float32)
    np.testing.assert_allclose(_load_h5_predict(h5, x),
                               _flax_predict(config, variables, x),
                               atol=2e-5)


def test_export_import_round_trip(tmp_path, rng):
    """import(export(m)) reproduces the weights bit-exactly."""
    path, config, variables = _save_random_model(
        tmp_path, rng, upsample_factor=2, architecture="srresnet",
        num_blocks=1, num_filters=8, batch_norm=True)

    from simplesr_tpu.tools.export_keras import export_keras_model
    from simplesr_tpu.tools.import_keras import import_keras_model
    h5 = str(tmp_path / "gen.h5")
    export_keras_model(path, h5, reference=REFERENCE)
    config2, variables2 = import_keras_model(h5)

    assert config2["num_blocks"] == config["num_blocks"]
    assert config2["num_filters"] == config["num_filters"]
    assert config2["batch_norm"] is True

    import jax
    flat1 = jax.tree_util.tree_leaves_with_path(dict(variables))
    flat2 = {jax.tree_util.keystr(p): np.asarray(v)
             for p, v in jax.tree_util.tree_leaves_with_path(dict(variables2))}
    for p, v in flat1:
        np.testing.assert_array_equal(
            np.asarray(v, np.float32), flat2[jax.tree_util.keystr(p)],
            err_msg=jax.tree_util.keystr(p))


def test_wide_growth_rejected(tmp_path, rng):
    """growth_channels != num_filters//2 has no reference representation;
    the exporter must refuse, not silently mis-map."""
    path, _, _ = _save_random_model(
        tmp_path, rng, upsample_factor=2, architecture="rrdb",
        num_blocks=1, num_dense_blocks=2, num_convs=2, num_filters=8,
        growth_channels=8, batch_norm=False)
    from simplesr_tpu.tools.export_keras import export_keras_model
    with pytest.raises(ValueError, match="growth_channels"):
        export_keras_model(path, str(tmp_path / "w.h5"), reference=REFERENCE)


def test_growth_none_means_default(tmp_path, rng):
    """Model files saved from training carry `growth_channels: None` for
    the default split — that must export, not be rejected as wide."""
    path, config, variables = _save_random_model(
        tmp_path, rng, upsample_factor=2, architecture="rrdb",
        num_blocks=1, num_dense_blocks=2, num_convs=2, num_filters=8,
        growth_channels=None, batch_norm=False)
    from simplesr_tpu.tools.export_keras import export_keras_model
    h5 = str(tmp_path / "g.h5")
    export_keras_model(path, h5, reference=REFERENCE)
    x = rng.uniform(0, 1, (1, 8, 8, 3)).astype(np.float32)
    np.testing.assert_allclose(_load_h5_predict(h5, x),
                               _flax_predict(config, variables, x),
                               atol=2e-5)


def test_cli(tmp_path, rng):
    path, _, _ = _save_random_model(
        tmp_path, rng, upsample_factor=2, architecture="srresnet",
        num_blocks=1, num_filters=8, batch_norm=False)
    from simplesr_tpu.tools.export_keras import main
    h5 = str(tmp_path / "g.h5")
    assert main([path, h5, "--reference", REFERENCE]) == 0
    assert os.path.exists(h5)

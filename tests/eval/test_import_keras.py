"""Keras `.h5` importer, with the REFERENCE's own builders as the oracle:
build a reference generator in legacy Keras, save it the way the reference
does (sr_model.py:233-244), import it, and require numerical output
agreement between the TF model and the flax module on the same input."""

import os

import numpy as np
import pytest

pytest.importorskip("h5py")

os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")


@pytest.fixture(scope="module")
def reference_builder():
    import sys
    sys.path.append("/root/reference")
    try:
        from simple_sr.utils.models import model_builder
        yield model_builder
    finally:
        sys.path.remove("/root/reference")


def _tf_predict(model, x):
    return np.asarray(model(x, training=False))


def _flax_predict(config, variables, x):
    import jax.numpy as jnp
    from simplesr_tpu.models import build_generator_model
    module = build_generator_model(**config, dtype=jnp.float32)
    return np.asarray(module.apply(variables, jnp.asarray(x), train=False))


@pytest.mark.parametrize("batch_norm", [True, False])
def test_srresnet_import_matches_reference(tmp_path, rng, reference_builder,
                                           batch_norm):
    model = reference_builder.build_resnet(
        upsample_factor=2, num_filters=8, num_res_blocks=2,
        batch_normalization=batch_norm)
    h5 = str(tmp_path / "gen.h5")
    model.save(h5)

    from simplesr_tpu.tools.import_keras import import_keras_model
    out = str(tmp_path / "gen.msgpack")
    config, variables = import_keras_model(h5, out)
    assert config["upsample_factor"] == 2
    assert config["num_blocks"] == 2
    assert config["num_filters"] == 8
    assert config["batch_norm"] is batch_norm
    assert os.path.exists(out)

    x = rng.uniform(0, 1, (2, 12, 12, 3)).astype(np.float32)
    want = _tf_predict(model, x)
    got = _flax_predict(config, variables, x)
    np.testing.assert_allclose(got, want, atol=2e-5)

    # and the saved .msgpack round-trips through the standard loader
    from simplesr_tpu.train import load_model
    module, vars2 = load_model(out)
    import jax.numpy as jnp
    got2 = np.asarray(module.apply(vars2, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got2, want, atol=1e-2)  # bf16 default policy


def test_rrdb_import_matches_reference(tmp_path, rng, reference_builder):
    model = reference_builder.build_enhanced_resnet(
        upsample_factor=4, num_filters=8, num_rrdb_blocks=2,
        num_dense_blocks=2, num_convs=3)
    h5 = str(tmp_path / "rrdb.h5")
    model.save(h5)

    from simplesr_tpu.tools.import_keras import import_keras_model
    out = str(tmp_path / "rrdb.msgpack")
    config, variables = import_keras_model(h5, out, num_dense_blocks=2)
    assert config["upsample_factor"] == 4
    assert config["num_blocks"] == 2
    assert config["num_dense_blocks"] == 2
    assert config["num_convs"] == 3
    assert config["num_filters"] == 8

    x = rng.uniform(0, 1, (1, 10, 10, 3)).astype(np.float32)
    want = _tf_predict(model, x)
    got = _flax_predict(config, variables, x)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_srgan_generator_h5_imports(tmp_path, rng, reference_builder):
    """The GAN-stage generator is the same topology — a GAN-trained .h5
    (what the reference's SRGAN campaign produces) imports identically."""
    model = reference_builder.build_or_load_generator_model(
        upsample_factor=2, architecture="srresnet", num_blocks=1,
        num_filters=8, kernel_size=3, residual_scaling=0.2,
        kernel_initializer=None, batch_norm=True, input_dims=(None, None),
        pretrained_model_path=None)
    h5 = str(tmp_path / "gan_gen.h5")
    model.save(h5)

    from simplesr_tpu.tools.import_keras import import_keras_model
    config, variables = import_keras_model(h5, str(tmp_path / "g.msgpack"))
    x = rng.uniform(0, 1, (1, 8, 8, 3)).astype(np.float32)
    np.testing.assert_allclose(_flax_predict(config, variables, x),
                               _tf_predict(model, x), atol=2e-5)


def test_cli_and_bad_input(tmp_path, reference_builder):
    from simplesr_tpu.tools.import_keras import main, import_keras_model

    model = reference_builder.build_resnet(upsample_factor=2, num_filters=8,
                                           num_res_blocks=1)
    h5 = str(tmp_path / "g.h5")
    model.save(h5)
    out = str(tmp_path / "g.msgpack")
    assert main([h5, out]) == 0
    assert os.path.exists(out)

    # an RRDB file force-read as srresnet must fail loudly, not mis-map
    rr = reference_builder.build_enhanced_resnet(
        upsample_factor=2, num_filters=8, num_rrdb_blocks=1,
        num_dense_blocks=2, num_convs=2)
    h5rr = str(tmp_path / "rr.h5")
    rr.save(h5rr)
    with pytest.raises(ValueError):
        import_keras_model(h5rr, arch="srresnet")

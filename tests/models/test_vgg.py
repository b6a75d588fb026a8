"""VGG feature parity: our flax VGG with weights copied into a Keras-built
VGG (random weights — no ImageNet download in this environment) must produce
identical pre- and post-activation features. This replicates the reference's
custom-VGG equivalence test (tests/models/test_custom_vgg.py:18-41) modulo
pretrained weights."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from simplesr_tpu.models import VGGFeatures, vgg_layer_names, init_vgg_params


def test_layer_names():
    names19 = vgg_layer_names("vgg19")
    assert len(names19) == 16
    assert names19[0] == "block1_conv1" and names19[-1] == "block5_conv4"
    names16 = vgg_layer_names("vgg16")
    assert len(names16) == 13 and names16[-1] == "block5_conv3"


def test_unknown_layer_raises():
    m = VGGFeatures(output_layers=("block9_conv1",))
    with pytest.raises(ValueError):
        m.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))


@pytest.mark.parametrize("variant,layer", [("vgg19", "block5_conv4"),
                                           ("vgg16", "block3_conv3")])
@pytest.mark.parametrize("before_activation", [False, True])
def test_feature_parity_with_keras(rng, variant, layer, before_activation):
    import tensorflow as tf

    params = init_vgg_params(variant)
    module = VGGFeatures(variant=variant, output_layers=(layer,),
                         before_activation=before_activation)
    x = rng.uniform(-100, 150, size=(1, 64, 64, 3)).astype(np.float32)
    ours = np.asarray(module.apply(params, x)[layer])

    # Build the equivalent Keras graph with the same weights.
    app = tf.keras.applications.vgg19.VGG19 if variant == "vgg19" else \
        tf.keras.applications.vgg16.VGG16
    keras_vgg = app(include_top=False, weights=None, input_shape=(64, 64, 3))
    for name, lp in params["params"].items():
        keras_vgg.get_layer(name).set_weights(
            [np.asarray(lp["kernel"]), np.asarray(lp["bias"])])
    tap_layer = keras_vgg.get_layer(layer)
    if before_activation:
        # Keras convs bake in the ReLU; rebuild the tap pre-activation like
        # the reference's _custom_vgg does (model_builder.py:255-272).
        import tensorflow as tf2
        w, b = tap_layer.get_weights()
        feed = tf.keras.Model(keras_vgg.input, tap_layer.input)(x)
        theirs = tf2.nn.conv2d(feed, w, strides=1, padding="SAME") + b
        theirs = theirs.numpy()
    else:
        theirs = tf.keras.Model(keras_vgg.input, tap_layer.output)(x).numpy()

    # Deep conv stacks accumulate order-dependent f32 noise (oneDNN vs XLA);
    # compare by relative L2 over the whole feature map.
    rel_l2 = np.linalg.norm(ours - theirs) / (np.linalg.norm(theirs) + 1e-12)
    assert rel_l2 < 1e-4, rel_l2


def test_multi_layer_taps():
    params = init_vgg_params("vgg19")
    m = VGGFeatures(variant="vgg19",
                    output_layers=("block2_conv2", "block5_conv4"))
    taps = m.apply(params, jnp.zeros((1, 64, 64, 3)))
    assert set(taps) == {"block2_conv2", "block5_conv4"}
    assert taps["block2_conv2"].shape == (1, 32, 32, 128)
    assert taps["block5_conv4"].shape == (1, 4, 4, 512)


def test_default_weights_path_discovery(tmp_path, monkeypatch):
    from simplesr_tpu.models.vgg import default_vgg_weights_path

    monkeypatch.delenv("SIMPLESR_VGG_WEIGHTS", raising=False)
    # (no bundled vgg19.npz ships in this zero-egress environment)
    assert default_vgg_weights_path("vgg19") is None
    f = tmp_path / "w.npz"
    f.write_bytes(b"x")
    monkeypatch.setenv("SIMPLESR_VGG_WEIGHTS", str(f))
    assert default_vgg_weights_path("vgg19") == str(f)
    monkeypatch.setenv("SIMPLESR_VGG_WEIGHTS", str(tmp_path / "missing.npz"))
    assert default_vgg_weights_path("vgg19") is None


@pytest.mark.skipif(
    __import__("simplesr_tpu.models.vgg", fromlist=["x"])
    .default_vgg_weights_path("vgg19") is None,
    reason="no ImageNet VGG19 weights available (zero-egress environment); "
           "this test activates the moment a weights .npz appears — set "
           "SIMPLESR_VGG_WEIGHTS or drop vgg19.npz next to models/vgg.py")
def test_imagenet_feature_parity_with_keras():
    """The reference's pretrained-VGG equivalence bar
    (tests/models/test_custom_vgg.py:26-41): with REAL ImageNet weights, our
    flax extractor must reproduce Keras VGG19 features on real image batches.
    Weights-gated: skipped until a weights file exists."""
    import tensorflow as tf
    from simplesr_tpu.models.vgg import (default_vgg_weights_path,
                                         load_vgg_weights_npz)

    path = default_vgg_weights_path("vgg19")
    params = load_vgg_weights_npz(path, "vgg19")
    module = VGGFeatures(variant="vgg19", output_layers=("block5_conv4",))

    keras_vgg = tf.keras.applications.vgg19.VGG19(
        include_top=False, weights="imagenet", input_shape=(96, 96, 3))
    # layer correspondence: same kernels/biases layer by layer
    for name, lp in params["params"].items():
        kw, kb = keras_vgg.get_layer(name).get_weights()
        np.testing.assert_array_equal(np.asarray(lp["kernel"]), kw)
        np.testing.assert_array_equal(np.asarray(lp["bias"]), kb)

    rng_ = np.random.default_rng(0)
    x = rng_.uniform(0, 255, size=(2, 96, 96, 3)).astype(np.float32)
    pre = tf.keras.applications.vgg19.preprocess_input(x.copy())
    ours = np.asarray(module.apply(params, jnp.asarray(pre))["block5_conv4"])
    theirs = tf.keras.Model(
        keras_vgg.input, keras_vgg.get_layer("block5_conv4").output)(pre).numpy()
    rel_l2 = np.linalg.norm(ours - theirs) / (np.linalg.norm(theirs) + 1e-12)
    assert rel_l2 < 1e-4, rel_l2


def test_npz_roundtrip(tmp_path):
    from simplesr_tpu.models import load_vgg_weights_npz

    params = init_vgg_params("vgg16")
    arrays = {}
    for name, lp in params["params"].items():
        arrays[f"{name}/kernel"] = np.asarray(lp["kernel"])
        arrays[f"{name}/bias"] = np.asarray(lp["bias"])
    np.savez(tmp_path / "vgg.npz", **arrays)
    loaded = load_vgg_weights_npz(tmp_path / "vgg.npz", "vgg16")
    for name in params["params"]:
        np.testing.assert_array_equal(
            np.asarray(loaded["params"][name]["kernel"]),
            np.asarray(params["params"][name]["kernel"]))

"""VGGLoss behavior: preprocessing, multi-layer summation, pre/post taps,
TV term, zero loss on identical inputs."""

import numpy as np
import pytest
import jax.numpy as jnp

from simplesr_tpu.losses import VGGLoss, vgg_preprocess
from simplesr_tpu.models import init_vgg_params


@pytest.fixture(scope="module")
def vgg_params():
    return init_vgg_params("vgg19")


def test_preprocess_matches_keras(rng):
    import tensorflow as tf
    x = rng.uniform(0, 255, size=(1, 8, 8, 3)).astype(np.float32)
    ours = np.asarray(vgg_preprocess(jnp.asarray(x)))
    theirs = tf.keras.applications.vgg19.preprocess_input(x.copy())
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)


def test_identical_inputs_zero_loss(rng, vgg_params):
    vl = VGGLoss("block2_conv2", vgg_params=vgg_params)
    x = rng.uniform(-1, 1, size=(1, 32, 32, 3)).astype(np.float32)
    loss, metrics = vl(x, x, None, None)
    assert float(loss) == pytest.approx(0.0, abs=1e-8)
    assert "vgg_loss" in metrics


def test_multi_layer_sums(rng, vgg_params):
    x = rng.uniform(-1, 1, size=(1, 32, 32, 3)).astype(np.float32)
    y = rng.uniform(-1, 1, size=(1, 32, 32, 3)).astype(np.float32)
    l1, _ = VGGLoss("block1_conv2", vgg_params=vgg_params)(x, y, None, None)
    l2, _ = VGGLoss("block2_conv2", vgg_params=vgg_params)(x, y, None, None)
    l12, _ = VGGLoss(["block1_conv2", "block2_conv2"], vgg_params=vgg_params)(x, y, None, None)
    assert float(l12) == pytest.approx(float(l1) + float(l2), rel=1e-5)


def test_feature_scale_quadratic(rng, vgg_params):
    x = rng.uniform(-1, 1, size=(1, 32, 32, 3)).astype(np.float32)
    y = rng.uniform(-1, 1, size=(1, 32, 32, 3)).astype(np.float32)
    base, _ = VGGLoss("block1_conv2", vgg_params=vgg_params)(x, y, None, None)
    scaled, _ = VGGLoss("block1_conv2", feature_scale=0.5, vgg_params=vgg_params)(x, y, None, None)
    assert float(scaled) == pytest.approx(float(base) * 0.25, rel=1e-4)


def test_pre_vs_post_activation_differ(rng, vgg_params):
    x = rng.uniform(-1, 1, size=(1, 32, 32, 3)).astype(np.float32)
    y = rng.uniform(-1, 1, size=(1, 32, 32, 3)).astype(np.float32)
    post, _ = VGGLoss("block3_conv3", after_activation=True, vgg_params=vgg_params)(x, y, None, None)
    pre, _ = VGGLoss("block3_conv3", after_activation=False, vgg_params=vgg_params)(x, y, None, None)
    assert float(pre) != pytest.approx(float(post), rel=1e-3)
    assert float(pre) >= float(post) - 1e-6  # ReLU can only shrink the distance


def test_tv_term_added(rng, vgg_params):
    x = rng.uniform(-1, 1, size=(1, 16, 16, 3)).astype(np.float32)
    y = rng.uniform(-1, 1, size=(1, 16, 16, 3)).astype(np.float32)
    without, _ = VGGLoss("block1_conv1", vgg_params=vgg_params)(x, y, None, None)
    with_tv, _ = VGGLoss("block1_conv1", total_variation_loss=True,
                         total_varation_weight=1e-4, vgg_params=vgg_params)(x, y, None, None)
    assert float(with_tv) > float(without)


def test_missing_weights_path_raises():
    with pytest.raises(ValueError):
        VGGLoss("block1_conv1", custom_weights=True)


def test_custom_weights_npz_loading(tmp_path, rng, vgg_params):
    """Weights loaded from an .npz file must reproduce the injected-params
    loss exactly (the reference's custom_weights_path flow, vgg_loss.py:90)."""
    import numpy as np

    arrays = {}
    for name, lp in vgg_params["params"].items():
        arrays[f"{name}/kernel"] = np.asarray(lp["kernel"])
        arrays[f"{name}/bias"] = np.asarray(lp["bias"])
    path = tmp_path / "vgg19.npz"
    np.savez(path, **arrays)

    x = rng.uniform(-1, 1, size=(1, 32, 32, 3)).astype(np.float32)
    y = rng.uniform(-1, 1, size=(1, 32, 32, 3)).astype(np.float32)
    a, _ = VGGLoss("block2_conv2", vgg_params=vgg_params)(x, y, None, None)
    b, _ = VGGLoss("block2_conv2", custom_weights_path=str(path))(x, y, None, None)
    assert float(a) == pytest.approx(float(b), rel=1e-6)


def test_random_fallback_warns(caplog, monkeypatch):
    """With no weights anywhere, constructing VGGLoss must WARN loudly that
    perceptual features are random-init (VERDICT r2: silent degradation)."""
    import logging

    monkeypatch.delenv("SIMPLESR_VGG_WEIGHTS", raising=False)
    with caplog.at_level(logging.WARNING, logger="simple_sr"):
        VGGLoss("block1_conv1")
    assert any("RANDOM-init" in r.message for r in caplog.records)


def test_env_discovered_weights_used_silently(tmp_path, rng, vgg_params,
                                              caplog, monkeypatch):
    """SIMPLESR_VGG_WEIGHTS discovery: the loss loads the file (same values
    as injected params) and does NOT warn."""
    import logging

    arrays = {}
    for name, lp in vgg_params["params"].items():
        arrays[f"{name}/kernel"] = np.asarray(lp["kernel"])
        arrays[f"{name}/bias"] = np.asarray(lp["bias"])
    path = tmp_path / "vgg19.npz"
    np.savez(path, **arrays)
    monkeypatch.setenv("SIMPLESR_VGG_WEIGHTS", str(path))

    x = rng.uniform(-1, 1, size=(1, 32, 32, 3)).astype(np.float32)
    y = rng.uniform(-1, 1, size=(1, 32, 32, 3)).astype(np.float32)
    with caplog.at_level(logging.WARNING, logger="simple_sr"):
        auto, _ = VGGLoss("block2_conv2")(x, y, None, None)
    assert not any("RANDOM-init" in r.message for r in caplog.records)
    ref, _ = VGGLoss("block2_conv2", vgg_params=vgg_params)(x, y, None, None)
    assert float(auto) == pytest.approx(float(ref), rel=1e-6)

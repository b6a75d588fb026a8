"""LearnedPerceptualLoss: the in-domain perceptual substitute for the
unavailable ImageNet VGG (losses/learned_perceptual.py)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from simplesr_tpu.losses import LearnedPerceptualLoss
from simplesr_tpu.models import SRResNet
from simplesr_tpu.train import Generator
from simplesr_tpu.train.serialization import save_model


@pytest.fixture(scope="module")
def extractor():
    m = SRResNet(upsample_factor=2, num_res_blocks=2, num_filters=8,
                 batch_norm=False, dtype=jnp.float32)
    v = m.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))
    return m, v


def test_identical_inputs_zero_loss(rng, extractor):
    lp = LearnedPerceptualLoss(extractor=extractor)
    x = rng.uniform(-1, 1, size=(2, 16, 16, 3)).astype(np.float32)
    loss, metrics = lp(x, x, None, None)
    assert float(loss) == pytest.approx(0.0, abs=1e-8)
    assert "learned_perceptual_loss" in metrics


def test_differs_from_pixel_mse(rng, extractor):
    """Feature-space distance is not pixel distance: two pairs with equal
    pixel MSE get different perceptual losses."""
    lp = LearnedPerceptualLoss(extractor=extractor)
    x = rng.uniform(-0.5, 0.5, size=(1, 16, 16, 3)).astype(np.float32)
    shift = x + 0.1                       # constant offset
    noise = x + 0.1 * np.sign(rng.normal(size=x.shape)).astype(np.float32)
    a, _ = lp(x, shift, None, None)
    b, _ = lp(x, noise, None, None)
    assert float(a) != pytest.approx(float(b), rel=1e-3)


def test_weight_and_scale(rng, extractor):
    x = rng.uniform(-1, 1, size=(1, 16, 16, 3)).astype(np.float32)
    y = rng.uniform(-1, 1, size=(1, 16, 16, 3)).astype(np.float32)
    base, _ = LearnedPerceptualLoss(extractor=extractor)(x, y, None, None)
    w, _ = LearnedPerceptualLoss(extractor=extractor, loss_weight=0.5)(x, y, None, None)
    s, _ = LearnedPerceptualLoss(extractor=extractor, feature_scale=0.5)(x, y, None, None)
    assert float(w) == pytest.approx(0.5 * float(base), rel=1e-5)
    assert float(s) == pytest.approx(0.25 * float(base), rel=1e-5)


def test_from_saved_model(tmp_path, rng, extractor):
    """Loading the extractor from a saved .msgpack reproduces the injected
    extractor's loss, and the functor works inside a jitted train step."""
    gen = Generator.srresnet(upsample_factor=2, num_blocks=2, num_filters=8,
                             batch_norm=False, dtype=jnp.float32,
                             input_dims=(16, 16))
    path = str(tmp_path / "gen.msgpack")
    save_model(gen.module_config(), gen.variables, path)

    lp = LearnedPerceptualLoss(model_path=path)
    x = rng.uniform(-1, 1, size=(1, 16, 16, 3)).astype(np.float32)
    y = rng.uniform(-1, 1, size=(1, 16, 16, 3)).astype(np.float32)
    inj = LearnedPerceptualLoss(
        extractor=(gen.model(), gen.variables))
    a, _ = lp(x, y, None, None)
    b, _ = inj(x, y, None, None)
    assert float(a) == pytest.approx(float(b), rel=1e-6)

    jitted = jax.jit(lambda u, v: lp(u, v, None, None)[0])
    assert np.isfinite(float(jitted(x, y)))


def test_rrdb_extractor_works(rng):
    """RRDBNet trunks (no train arg in _features) also serve as extractors."""
    from simplesr_tpu.models import RRDBNet

    m = RRDBNet(upsample_factor=2, num_filters=8, num_rrdb_blocks=1,
                dtype=jnp.float32)
    v = m.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
    lp = LearnedPerceptualLoss(extractor=(m, v))
    x = rng.uniform(-1, 1, size=(1, 8, 8, 3)).astype(np.float32)
    y = rng.uniform(-1, 1, size=(1, 8, 8, 3)).astype(np.float32)
    loss, _ = lp(x, y, None, None)
    assert float(loss) > 0.0

"""Model zoo (simplesr_tpu/zoo.py): the committed campaign models are
discoverable by name with held-out metrics, and load into working
predictors. The reference's analogue is its README pretrained-model links."""

import numpy as np
import pytest
import jax.numpy as jnp

from simplesr_tpu import zoo


def test_discovery_finds_committed_models():
    entries = zoo.list_models()
    assert len(entries) >= 10
    names = {e.name for e in entries}
    # unqualified names are unique
    assert len(names) == len(entries)
    for e in entries:
        assert e.kind in ("resnet", "gan")
        assert e.scale in (2, 4, 8)
        assert e.tag in ("best", "final", "best_ema")
        import os
        assert os.path.isfile(e.path)
    # collision case: both rrdb x4 campaigns reachable
    assert "rrdb_x4" in names
    assert any(n.startswith("rrdb_x4@") for n in names)


def test_heldout_metrics_extracted():
    e = zoo.describe("srresnet_x2")
    assert e is not None
    m = e.metrics
    assert m["heldout_psnr"] > m["heldout_psnr_bicubic"] > 20
    assert 0 < m["heldout_ssim"] <= 1
    # the JPEG recipe is scored on degraded inputs and marked as such
    jpg = zoo.describe("srresnet_jpg_x2")
    assert jpg.metrics.get("degraded_inputs") is True


def test_jpg_study_schema_metrics():
    """The round-4 JPEG-study schema (images.<name>.<quality>.<column>)
    yields metrics for both the noise-trained model and the clean control."""
    rq = zoo.describe("srresnet_jpg_rq_x2")
    assert rq.metrics.get("degraded_inputs") is True
    assert rq.metrics["heldout_psnr"] > rq.metrics["heldout_psnr_bicubic"]
    assert rq.metrics["heldout_images"] == 2
    ctl = zoo.describe("srresnet_ctl_x2")
    assert "degraded_inputs" not in ctl.metrics  # scored on clean inputs
    assert ctl.metrics["heldout_psnr"] > ctl.metrics["heldout_psnr_bicubic"]


def test_unknown_name_lists_available():
    with pytest.raises(KeyError, match="srresnet_x2"):
        zoo.load("nope_x9")


def test_zoo_spec_resolves_everywhere():
    # load_payload is the single loader chokepoint: `zoo:<name>` works in
    # every model-path surface (warm start, serving, distill teacher, ...)
    from simplesr_tpu.train import serialization
    entry = zoo.describe("srresnet_x2")
    assert serialization.resolve_model_spec("zoo:srresnet_x2") == entry.path
    assert serialization.resolve_model_spec(entry.path) == entry.path
    cfg, variables = serialization.load_payload("zoo:srresnet_x2")
    assert "params" in variables
    with pytest.raises(KeyError):
        serialization.load_payload("zoo:not_a_model")


def test_load_raw_and_predict():
    module, variables = zoo.load_raw("srresnet_x2")
    assert "params" in variables
    predict = zoo.load("srresnet_x2")
    lr = jnp.asarray(np.random.default_rng(0)
                     .uniform(0, 1, (1, 8, 8, 3)).astype(np.float32))
    sr = np.asarray(predict(lr))
    assert sr.shape == (1, 16, 16, 3)
    assert np.isfinite(sr).all() and sr.min() >= -1.001 and sr.max() <= 1.001

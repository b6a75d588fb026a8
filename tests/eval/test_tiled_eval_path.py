"""The memory-efficient tiled path triggers for >1000×1000 inputs and
produces the full-size SR output (gather path on CPU; the Pallas DMA kernel
covers the same contract on TPU)."""

import numpy as np
import jax.numpy as jnp

from simplesr_tpu.eval.evaluation import _upscale, _eligible_efficient_inference


def test_eligibility_rules(rng):
    big = np.zeros((1, 1100, 1200, 3), np.float32)
    small = np.zeros((1, 500, 500, 3), np.float32)
    batch = np.zeros((2, 1100, 1200, 3), np.float32)
    assert _eligible_efficient_inference(big)
    assert not _eligible_efficient_inference(small)
    assert not _eligible_efficient_inference(batch)  # tiling is batch-1 only


def test_tiled_upscale_matches_direct_for_local_model(rng):
    img = rng.uniform(0, 1, (1, 1024, 1056, 3)).astype(np.float32)

    def fake_sr(batch):  # nearest x2: shift-invariant → tiling must be exact
        return jnp.repeat(jnp.repeat(jnp.asarray(batch), 2, axis=1), 2, axis=2)

    out = np.asarray(_upscale(fake_sr, img, scale=2))
    assert out.shape == (1, 2048, 2112, 3)
    np.testing.assert_array_equal(out, np.asarray(fake_sr(img)))

"""Spatially-sharded inference with a halo covering the receptive field must
match the direct (single-device) forward of the REAL generator — the
distributed analogue of the host-tiling seam-free guarantee."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from simplesr_tpu.models import SRResNet
from simplesr_tpu.parallel import make_mesh, spatial_sharded_apply, SPATIAL_AXIS


def test_srresnet_spatial_shard_matches_direct(rng):
    # 1 res block + 9x9 stem + 9x9 head: LR receptive field radius ≈
    # 4 + 2 + 1 + 4(at HR→2 LR) ≈ 11 px → halo 16 is sufficient.
    model = SRResNet(upsample_factor=2, num_res_blocks=1, num_filters=8,
                     batch_norm=False, dtype=jnp.float32)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))
    img = jnp.asarray(rng.uniform(0, 1, (128, 32, 3)), jnp.float32)

    mesh = make_mesh({SPATIAL_AXIS: 4}, devices=jax.devices()[:4])
    halo = 16
    scale = 2
    sharded = spatial_sharded_apply(
        lambda x: model.apply(variables, x, train=False),
        img, mesh, scale=scale, halo=halo)
    direct = model.apply(variables, img[None], train=False)[0]

    assert sharded.shape == direct.shape == (256, 64, 3)
    s, d = np.asarray(sharded), np.asarray(direct)
    # interior (incl. every inter-device seam at HR rows 64/128/192): exact
    m = halo * scale
    np.testing.assert_allclose(s[m:-m], d[m:-m], atol=2e-5, rtol=1e-4)
    for boundary in (64, 128, 192):
        np.testing.assert_allclose(s[boundary - 8:boundary + 8],
                                   d[boundary - 8:boundary + 8],
                                   atol=2e-5, rtol=1e-4)
    # outer borders follow the tiled-inference convention (zero context
    # beyond the image at every layer) — close but not bit-equal to the
    # whole-image SAME-padding forward
    assert np.abs(s[:m] - d[:m]).max() < 0.5


def test_polyphase_spatial_shard_matches_direct(rng):
    """The serving-path (polyphase) model is fully convolutional at LR, so
    it composes with halo-exchange spatial sharding the same way — seams
    must stay exact with a receptive-field-covering halo."""
    from simplesr_tpu.models.polyphase import polyphase_model

    model = SRResNet(upsample_factor=2, num_res_blocks=1, num_filters=8,
                     batch_norm=False, dtype=jnp.float32)
    variables = model.init(jax.random.key(1), jnp.zeros((1, 16, 16, 3)))
    poly, pvars = polyphase_model(model, variables)
    img = jnp.asarray(rng.uniform(0, 1, (128, 32, 3)), jnp.float32)

    mesh = make_mesh({SPATIAL_AXIS: 4}, devices=jax.devices()[:4])
    halo, scale = 16, 2
    sharded = spatial_sharded_apply(
        lambda x: poly.apply(pvars, x, train=False),
        img, mesh, scale=scale, halo=halo)
    direct = model.apply(variables, img[None], train=False)[0]

    s, d = np.asarray(sharded), np.asarray(direct)
    m = halo * scale
    np.testing.assert_allclose(s[m:-m], d[m:-m], atol=1e-3, rtol=1e-3)
    for boundary in (64, 128, 192):
        np.testing.assert_allclose(s[boundary - 8:boundary + 8],
                                   d[boundary - 8:boundary + 8],
                                   atol=1e-3, rtol=1e-3)


def test_indivisible_height_raises(rng):
    model_fn = lambda x: x.repeat(2, axis=1).repeat(2, axis=2)
    mesh = make_mesh({SPATIAL_AXIS: 8})
    with pytest.raises(ValueError):
        spatial_sharded_apply(model_fn, jnp.zeros((30, 16, 3)), mesh,
                              scale=2, halo=2)


def test_batched_2d_mesh_matches_direct(rng):
    """batch × spatial 2-D mesh: every image's seams exact, batch items
    independent — the 'many giant images on a slice' serving shape."""
    from simplesr_tpu.parallel import DATA_AXIS, spatial_sharded_apply_batched

    model = SRResNet(upsample_factor=2, num_res_blocks=1, num_filters=8,
                     batch_norm=False, dtype=jnp.float32)
    variables = model.init(jax.random.key(2), jnp.zeros((1, 16, 16, 3)))
    imgs = jnp.asarray(rng.uniform(0, 1, (4, 128, 32, 3)), jnp.float32)

    mesh = make_mesh({DATA_AXIS: 2, SPATIAL_AXIS: 4})
    halo, scale = 16, 2
    sharded = spatial_sharded_apply_batched(
        lambda x: model.apply(variables, x, train=False),
        imgs, mesh, scale=scale, halo=halo)
    direct = model.apply(variables, imgs, train=False)

    assert sharded.shape == direct.shape == (4, 256, 64, 3)
    s, d = np.asarray(sharded), np.asarray(direct)
    m = halo * scale
    np.testing.assert_allclose(s[:, m:-m], d[:, m:-m], atol=2e-5, rtol=1e-4)
    for boundary in (64, 128, 192):  # inter-device seams, every image
        np.testing.assert_allclose(s[:, boundary - 8:boundary + 8],
                                   d[:, boundary - 8:boundary + 8],
                                   atol=2e-5, rtol=1e-4)


def test_batched_2d_mesh_validates_divisibility(rng):
    from simplesr_tpu.parallel import DATA_AXIS, spatial_sharded_apply_batched

    mesh = make_mesh({DATA_AXIS: 2, SPATIAL_AXIS: 4})
    fn = lambda x: x.repeat(2, axis=1).repeat(2, axis=2)
    with pytest.raises(ValueError):  # batch 3 % 2 != 0
        spatial_sharded_apply_batched(fn, jnp.zeros((3, 64, 16, 3)), mesh,
                                      scale=2, halo=2)
    with pytest.raises(ValueError):  # height 30 % 4 != 0
        spatial_sharded_apply_batched(fn, jnp.zeros((2, 30, 16, 3)), mesh,
                                      scale=2, halo=2)

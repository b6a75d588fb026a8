"""Network interpolation between a PSNR model and a GAN model
(tools/interpolate.py; ESRGAN §3.4 — no reference counterpart)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simplesr_tpu.models import SRResNet
from simplesr_tpu.train import serialization
from simplesr_tpu.tools.interpolate import interpolate_models, main

CFG = dict(upsample_factor=2, architecture="srresnet", num_blocks=1,
           num_filters=8, batch_norm=False)


def _save(tmp_path, name, seed):
    model = SRResNet(upsample_factor=2, num_res_blocks=1, num_filters=8,
                     batch_norm=False)
    variables = model.init(jax.random.key(seed), jnp.zeros((1, 8, 8, 3)))
    path = str(tmp_path / name)
    serialization.save_model(CFG, jax.device_get(variables), path)
    return path, variables


def test_endpoints_and_midpoint(tmp_path):
    p_psnr, v_psnr = _save(tmp_path, "psnr.msgpack", 0)
    p_gan, v_gan = _save(tmp_path, "gan.msgpack", 1)

    for alpha, expect in ((0.0, v_psnr), (1.0, v_gan)):
        _, blended = interpolate_models(p_psnr, p_gan, alpha)
        jax.tree.map(lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6), blended, expect)

    _, mid = interpolate_models(p_psnr, p_gan, 0.5)
    jax.tree.map(
        lambda m, a, b: np.testing.assert_allclose(
            np.asarray(m), (np.asarray(a) + np.asarray(b)) / 2.0, rtol=1e-5),
        mid, v_psnr, v_gan)


def test_blended_model_loads_and_runs(tmp_path):
    p_psnr, _ = _save(tmp_path, "psnr.msgpack", 0)
    p_gan, _ = _save(tmp_path, "gan.msgpack", 1)
    out = main(["--psnr", p_psnr, "--gan", p_gan, "--alpha", "0.8",
                "--output", str(tmp_path / "blend.msgpack")])
    module, variables = serialization.load_model(out[0])
    sr = module.apply(variables, jnp.zeros((1, 8, 8, 3)), train=False)
    assert sr.shape == (1, 16, 16, 3)
    assert np.isfinite(np.asarray(sr)).all()


def test_alpha_sweep_writes_postfixed_files(tmp_path):
    p_psnr, _ = _save(tmp_path, "psnr.msgpack", 0)
    p_gan, _ = _save(tmp_path, "gan.msgpack", 1)
    outdir = tmp_path / "sweep"
    outdir.mkdir()
    outs = main(["--psnr", p_psnr, "--gan", p_gan,
                 "--alpha", "0.2", "0.8", "--output", str(outdir)])
    assert [o.endswith("gan_a0.2.msgpack") for o in outs][0]
    assert len(outs) == 2
    for o in outs:
        serialization.load_model(o)


def test_architecture_mismatch_raises(tmp_path):
    p_psnr, _ = _save(tmp_path, "psnr.msgpack", 0)
    model = SRResNet(upsample_factor=2, num_res_blocks=2, num_filters=8,
                     batch_norm=False)
    variables = model.init(jax.random.key(2), jnp.zeros((1, 8, 8, 3)))
    other_cfg = dict(CFG, num_blocks=2)
    p_other = str(tmp_path / "other.msgpack")
    serialization.save_model(other_cfg, jax.device_get(variables), p_other)
    with pytest.raises(ValueError, match="architectures differ"):
        interpolate_models(p_psnr, p_other, 0.5)

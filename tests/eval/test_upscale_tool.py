"""The upscale CLI tool end-to-end (tiny model, small image)."""

import numpy as np
from PIL import Image
import jax.numpy as jnp

from simplesr_tpu.train import Generator, save_model
from simplesr_tpu.tools.upscale import upscale_files, main


def _save_tiny_model(tmp_path):
    gen = Generator.srresnet(upsample_factor=2, num_blocks=1, num_filters=8,
                             dtype=jnp.float32, input_dims=(16, 16))
    path = str(tmp_path / "gen.msgpack")
    save_model(gen.module_config(), gen.variables, path)
    return path


def test_upscale_files(tmp_path, rng):
    model = _save_tiny_model(tmp_path)
    img = (rng.uniform(0, 255, (40, 56, 3))).astype(np.uint8)
    in_path = str(tmp_path / "in.png")
    Image.fromarray(img).save(in_path)
    outs = upscale_files(model, [in_path], str(tmp_path / "out"), scale=2)
    assert len(outs) == 1
    out = np.asarray(Image.open(outs[0]))
    assert out.shape == (80, 112, 3)


def test_cli_main(tmp_path, rng):
    model = _save_tiny_model(tmp_path)
    in_path = str(tmp_path / "x.png")
    Image.fromarray((rng.uniform(0, 255, (32, 32, 3))).astype(np.uint8)).save(in_path)
    rc = main(["--model", model, "--scale", "2",
               "--output", str(tmp_path / "o"), in_path])
    assert rc == 0
    assert (tmp_path / "o" / "x_x2.png").exists()


def test_no_fast_flag_matches_fast(tmp_path, rng):
    """--no-fast serves the training-form module; for an f32 model the two
    paths must produce (near-)identical PNG bytes."""
    model = _save_tiny_model(tmp_path)
    img = (rng.uniform(0, 255, (24, 24, 3))).astype(np.uint8)
    in_path = str(tmp_path / "in.png")
    Image.fromarray(img).save(in_path)

    rc = main(["--model", model, "--scale", "2", "--no-fast",
               "--output", str(tmp_path / "slow"), in_path])
    assert rc == 0
    outs = upscale_files(model, [in_path], str(tmp_path / "fast"), scale=2)
    slow = np.asarray(Image.open(str(tmp_path / "slow" / "in_x2.png")),
                      np.int16)
    fast = np.asarray(Image.open(outs[0]), np.int16)
    assert np.abs(slow - fast).max() <= 1  # f32 reassociation -> at most 1 LSB


def test_ensemble_flag(tmp_path, rng):
    """--ensemble runs and agrees with the direct self_ensemble of the same
    predictor (the CLI merely wraps it)."""
    from simplesr_tpu.eval.evaluation import _as_predictor
    from simplesr_tpu.ops import self_ensemble

    model = _save_tiny_model(tmp_path)
    img = (rng.uniform(0, 255, (20, 28, 3))).astype(np.uint8)
    in_path = str(tmp_path / "in.png")
    Image.fromarray(img).save(in_path)

    rc = main(["--model", model, "--scale", "2", "--ensemble",
               "--output", str(tmp_path / "ens"), in_path])
    assert rc == 0
    got = np.asarray(Image.open(str(tmp_path / "ens" / "in_x2.png")), np.int16)

    predict = _as_predictor(model, fast=True)
    x = jnp.asarray(img, jnp.float32)[None] / 255.0
    sr = np.asarray(self_ensemble(predict, x)[0])
    want = np.clip((sr + 1.0) * 127.5, 0, 255).astype(np.int16)
    assert np.abs(got - want).max() <= 1

    # and it must differ from the non-ensembled output (random-weight model
    # is not equivariant)
    plain = upscale_files(model, [in_path], str(tmp_path / "plain"), scale=2)
    plain_arr = np.asarray(Image.open(plain[0]), np.int16)
    assert np.abs(got - plain_arr).max() > 1

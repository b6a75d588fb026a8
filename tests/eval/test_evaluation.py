"""Evaluation ops on a tiny model + the reference fixture images."""

import numpy as np
import pytest
import jax.numpy as jnp

from simplesr_tpu.data import DataPipeline
from simplesr_tpu.eval import evaluate_on_validationdata, evaluate_on_testdata
from simplesr_tpu.train import Generator

GRAD_DIR = "/root/reference/tests/data/patterns/gradients"


class _Cfg:
    scale = 2
    batch_size = 2
    model_path = None
    crop_imgs = True
    crop_size = (32, 32, 3)
    num_crops = 1
    random_seed = 0
    crop_naive = True
    minimum_variation_patch = 0.0
    minimum_variation_batch = 0.0
    resize_filter = "bicubic"
    antialias = True
    test_data_paths = [GRAD_DIR]

    def __init__(self, tmp_path):
        self.pic_dir = str(tmp_path / "pics")


@pytest.fixture(scope="module")
def tiny_gen():
    return Generator.srresnet(upsample_factor=2, num_blocks=1, num_filters=8,
                              dtype=jnp.float32, input_dims=(16, 16))


def test_evaluate_on_validationdata_stats(tmp_path, tiny_gen):
    cfg = _Cfg(tmp_path)
    pipeline = DataPipeline.eval_pipeline(cfg)
    results = evaluate_on_validationdata(
        config=cfg, model_name="tiny", pipeline=pipeline, model=tiny_gen,
        calc_stats=True, save_grid=True)
    assert "tiny" in results and "bicubic" in results
    assert len(results["tiny"]["psnr"]) == 8  # 8 gradient images, 1 crop each
    assert np.isfinite(results["tiny"]["psnr"]).all()
    assert np.isfinite(results["tiny"]["ssim"]).all()
    # bicubic on smooth gradients should be high-PSNR
    assert np.mean(results["bicubic"]["psnr"]) > 25
    grids = list((tmp_path / "pics" / "grids").glob("*.png"))
    assert grids


def test_evaluate_on_testdata_outputs(tmp_path, tiny_gen):
    cfg = _Cfg(tmp_path)
    pipeline = DataPipeline.inference_pipeline(cfg)
    outs = evaluate_on_testdata(config=cfg, model_name="tiny",
                                pipeline=pipeline, model=tiny_gen,
                                save_single=True, grid=True)
    assert outs
    singles = list((tmp_path / "pics").rglob("single/*.png")) or \
        list((tmp_path / "pics").rglob("*tiny*.png"))
    assert singles
    for results in outs:
        sr = np.asarray(results["tiny"])
        assert sr.shape[-3] == 128 and sr.shape[-2] == 128  # 64x64 → x2


def test_model_from_saved_file(tmp_path, tiny_gen):
    from simplesr_tpu.train import save_model
    path = str(tmp_path / "gen.msgpack")
    save_model(tiny_gen.module_config(), tiny_gen.variables, path)
    cfg = _Cfg(tmp_path)
    cfg.model_path = [path]
    pipeline = DataPipeline.eval_pipeline(cfg)
    results = evaluate_on_validationdata(config=cfg, pipeline=pipeline,
                                         calc_stats=True)
    assert "gen" in results


def test_evaluate_with_self_ensemble(tmp_path, tiny_gen):
    """ensemble=True changes the model outputs (random weights are not
    equivariant) but leaves the bicubic comparison row untouched."""
    cfg = _Cfg(tmp_path)
    pipeline = DataPipeline.eval_pipeline(cfg)
    plain = evaluate_on_validationdata(
        config=cfg, model_name="tiny", pipeline=pipeline, model=tiny_gen,
        calc_stats=True)
    pipeline2 = DataPipeline.eval_pipeline(cfg)
    ens = evaluate_on_validationdata(
        config=cfg, model_name="tiny", pipeline=pipeline2, model=tiny_gen,
        calc_stats=True, ensemble=True)
    assert not np.allclose(plain["tiny"]["psnr"], ens["tiny"]["psnr"])
    np.testing.assert_allclose(plain["bicubic"]["psnr"],
                               ens["bicubic"]["psnr"], atol=1e-6)


def test_config_self_ensemble_knob(tmp_path):
    """ConfigUtil.evaluation_config carries the knob; evaluate_* read it
    when `ensemble` is not explicitly passed."""
    from simplesr_tpu.config import ConfigUtil

    cfg = ConfigUtil.evaluation_config(
        data_paths=GRAD_DIR, test_originals_path=None, model_paths=None,
        results_save_path=str(tmp_path), scale=2, create_save_dirs=False,
        self_ensemble=True)
    assert cfg.self_ensemble is True
    cfg2 = ConfigUtil.evaluation_config(
        data_paths=GRAD_DIR, test_originals_path=None, model_paths=None,
        results_save_path=str(tmp_path), scale=2, create_save_dirs=False)
    assert cfg2.self_ensemble is False

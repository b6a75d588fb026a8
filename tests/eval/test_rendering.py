import os

import numpy as np
import pytest
from PIL import Image

from simplesr_tpu.eval import rendering


def test_tensor_to_img_autoscales(rng):
    for lo, hi in [(-1, 1), (0, 1), (0, 255)]:
        x = rng.uniform(lo, hi, size=(8, 8, 3)).astype(np.float32)
        img = rendering.tensor_to_img(x)
        assert img.size == (8, 8)
        arr = np.asarray(img)
        assert arr.min() == 0 and arr.max() == 255


def test_save_single(rng, tmp_path):
    x = rng.uniform(-1, 1, size=(2, 16, 16, 3)).astype(np.float32)
    rendering.save_single(x, str(tmp_path), "out", label="model")
    assert (tmp_path / "out_0.png").exists() and (tmp_path / "out_1.png").exists()
    with pytest.raises(ValueError):
        rendering.save_single(x[0, 0], str(tmp_path), "bad")


def test_combine_halfs(rng, tmp_path):
    left = rng.uniform(0, 1, size=(2, 32, 32, 3)).astype(np.float32)
    right = rng.uniform(0, 1, size=(2, 32, 32, 3)).astype(np.float32)
    rendering.combine_halfs(left, right, "sr", str(tmp_path), "half")
    img = Image.open(tmp_path / "half_0.png")
    assert img.size == (32, 32)
    with pytest.raises(ValueError):
        rendering.combine_halfs(left, right[:1], "sr", str(tmp_path), "x")


def test_prepare_image_grid_rows_and_annotations(rng, tmp_path):
    imgs = {
        "modelA": rng.uniform(-1, 1, size=(3, 32, 32, 3)).astype(np.float32),
        "LR": rng.uniform(0, 1, size=(3, 16, 16, 3)).astype(np.float32),
        "ground truth": rng.uniform(-1, 1, size=(3, 32, 32, 3)).astype(np.float32),
    }
    psnr = {"modelA": np.array([30.0, np.inf, 28.0]),
            "LR": np.array([-1.0, -1.0, -1.0]),
            "ground truth": np.array([np.inf] * 3)}
    ssim = {"modelA": np.array([0.9, 1.0, 0.8]),
            "LR": np.array([-1.0] * 3),
            "ground truth": np.array([1.0] * 3)}
    out = rendering.prepare_image_grid(str(tmp_path), "grid", low_res_key="LR",
                                       psnr=psnr, ssim=ssim, **imgs)
    img = Image.open(out)
    # 3 rows × 3 cols of 32px + label gutter
    assert img.height == 3 * 32
    assert img.width >= 3 * 32


def test_grid_count_mismatch_raises(rng, tmp_path):
    with pytest.raises(ValueError):
        rendering.prepare_image_grid(
            str(tmp_path), "bad",
            a=rng.uniform(size=(2, 8, 8, 3)).astype(np.float32),
            b=rng.uniform(size=(3, 8, 8, 3)).astype(np.float32))


def test_grid_with_original(rng, tmp_path):
    orig = rng.uniform(0, 255, size=(64, 48, 3)).astype(np.float32)
    out = rendering.prepare_image_grid(
        str(tmp_path), "with_orig", original=orig,
        model=rng.uniform(size=(2, 32, 32, 3)).astype(np.float32))
    img = Image.open(out)
    assert img.width > 2 * 32  # original pasted alongside


def test_single_column_grid_side_by_side(rng, tmp_path):
    """num_cols == 1: models are laid out side by side in one row with
    inline labels — no rotated-label gutter (reference
    image_utils.py:341-366)."""
    out = rendering.prepare_image_grid(
        str(tmp_path), "single",
        model=rng.uniform(-1, 1, size=(1, 32, 32, 3)).astype(np.float32),
        bicubic=rng.uniform(-1, 1, size=(1, 32, 32, 3)).astype(np.float32),
        LR=rng.uniform(0, 1, size=(1, 16, 16, 3)).astype(np.float32),
        low_res_key="LR")
    img = Image.open(out)
    assert img.size == (3 * 32, 32)  # exactly 3 tiles wide, no gutter


def test_bundled_font_loads():
    """Annotations must not depend on system fonts: the packaged DejaVu
    TTF is found and loads at a size PIL's default font can't provide."""
    font = rendering._load_font(14)
    from PIL import ImageFont
    assert isinstance(font, ImageFont.FreeTypeFont)
    assert "simplesr_tpu" in getattr(font, "path", "")
